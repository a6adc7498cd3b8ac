package graft

import graft.operators.Relational
import graft.streaming.Streaming

/** The streaming twins must produce exactly the batch results (the
  * CORRECTNESS gate also proves this vs DuckDB; this is the in-repo
  * guard at a second scale factor). */
class StreamingSpec extends SparkSuite {

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
