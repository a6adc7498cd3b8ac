package graft

import graft.operators.Relational
import graft.streaming.Streaming

/** The streaming twins must produce exactly the batch results (the
  * CORRECTNESS gate also proves this vs DuckDB; this is the in-repo
  * guard at a second scale factor). */
class StreamingSpec extends SparkSuite
    with org.scalatest.BeforeAndAfterAll {

  private val tmpDirs = scala.collection.mutable.ArrayBuffer[String]()

  override def afterAll(): Unit = {
    import scala.reflect.io.Directory
    tmpDirs.foreach(d => new Directory(new java.io.File(d)).deleteRecursively())
    super.afterAll()
  }

  test("q_stream_window == q_events_bucket (batch twin)") {
    val streamRows = Streaming.streamWindow(spark, sfDir).collect().toSeq
    val batchRows = Relational.eventsBucket(spark, sfDir).collect().toSeq
    assert(streamRows.nonEmpty)
    assert(streamRows === batchRows)
  }

  test("q_stream_sessionize (flatMapGroupsWithState) == batch sessionize") {
    val streamRows = Streaming.streamSessionize(spark, sfDir).collect().toSeq
    val batchRows = Relational.sessionize(spark, sfDir).collect().toSeq
    assert(streamRows.nonEmpty)
    assert(streamRows === batchRows)
  }

  test("q_stream_asof (stateful point-in-time resolver) == batch as-of join") {
    val streamRows = Streaming.streamAsof(spark, sfDir).collect().toSeq
    val batchRows = graft.operators.Temporal.asofJoin(spark, sfDir)
      .collect().toSeq
    assert(streamRows.nonEmpty)
    assert(streamRows === batchRows)
  }

  test("q_stream_quality (stateless map-only stream) == batch quality score") {
    val streamRows = Streaming.streamQuality(spark, sfDir).collect().toSeq
    val batchRows = graft.operators.TextAnalysis.qualityScore(spark, sfDir)
      .collect().toSeq
    assert(streamRows.nonEmpty)
    assert(streamRows === batchRows)
  }

  /** Write the events table as three interleaved slices (event_id mod
    * 3) in separate files, then stream them one file per micro-batch:
    * every batch carries events from the WHOLE time range, so state
    * operators see heavy cross-batch event-time disorder. */
  private def splitReplay(name: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files
      .createTempDirectory(s"graft_split_$name").toString
    tmpDirs += tmp
    val ev = Tables.events(spark, sfDir)
    (0 until 3).foreach { i =>
      ev.where(pmod(col("event_id"), lit(3)) === i)
        .coalesce(1).write.mode("append").parquet(tmp)
    }
    val schema = spark.read.parquet(tmp).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(tmp)
  }

  test("stream sessionize stays exact under multi-batch out-of-order replay") {
    val stream = splitReplay("sess")
    val got = Streaming.streamSessionizeOver(spark, stream,
      "graft_split_sess").collect().toSeq
    val want = Relational.sessionize(spark, sfDir).collect().toSeq
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("stream as-of stays exact under multi-batch out-of-order replay") {
    val stream = splitReplay("asof")
    val got = Streaming.streamAsofOver(spark, stream,
      "graft_split_asof").collect().toSeq
    val want = graft.operators.Temporal.asofJoin(spark, sfDir)
      .collect().toSeq
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("stream window (complete mode) stays exact under out-of-order replay") {
    val got = Streaming.streamWindowOver(spark, splitReplay("win"),
      "graft_split_win").collect().toSeq
    val want = Relational.eventsBucket(spark, sfDir).collect().toSeq
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("stream dedup rollup stays exact under out-of-order replay") {
    import org.apache.spark.sql.functions._
    val got = Streaming.streamDedupOver(spark, splitReplay("ddp"),
      "graft_split_ddp").collect().toSeq
    val want = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).distinct()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_keys"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type").asc).collect().toSeq
    assert(got === want)
  }

  test("q_stream_dedup == batch distinct rollup") {
    import org.apache.spark.sql.functions._
    val streamRows = Streaming.streamDedup(spark, sfDir).collect().toSeq
    val batchRows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).distinct()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_keys"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type").asc)
      .collect().toSeq
    assert(streamRows.nonEmpty)
    assert(streamRows === batchRows)
  }
}
