package graft

import org.apache.spark.sql.functions._

import graft.sources.AuditSink

/** The graft-audit DSv2 sink must account exactly (rows through the
  * commit protocol), accumulate across writes, and cost nothing in
  * storage. */
class AuditSinkSpec extends SparkSuite {

  test("row and partition accounting is exact through the commit protocol") {
    AuditSink.reset("t1")
    val df = Tables.documents(spark, sfDir)
    val n = df.count()
    df.repartition(6).write.format("graft-audit").option("name", "t1")
      .mode("append").save()
    val st = AuditSink.stats("t1").get
    assert(st.rows === n)
    assert(st.partitions === 6)
    assert(st.bytes > 0L, "UnsafeRow byte accounting must be non-zero")
    assert(st.commits === 1L)
  }

  test("stats accumulate across writes and reset clears them") {
    AuditSink.reset("t2")
    val df = spark.range(100).select(col("id"))
    df.write.format("graft-audit").option("name", "t2").mode("append").save()
    val first = AuditSink.stats("t2").get
    df.write.format("graft-audit").option("name", "t2").mode("append").save()
    val st = AuditSink.stats("t2").get
    assert(st.rows === 200L)
    assert(st.commits === 2L)
    assert(st.partitions === first.partitions * 2,
      "partitions must accumulate across commits like rows/bytes do")
    AuditSink.reset("t2")
    assert(AuditSink.stats("t2").isEmpty)
  }

  test("synth source to audit sink: a zero-storage end-to-end dry-run") {
    AuditSink.reset("dry")
    // The full pipeline shape — generate, transform, account — with
    // no file I/O anywhere: the scale-test harness.
    spark.read.format("graft-synth")
      .option("rows", 5000).option("parts", 8).load()
      .where(col("doc_id") >= 1000)
      .select(col("doc_id"), col("source"), length(col("text")).as("len"))
      .write.format("graft-audit").option("name", "dry").mode("append")
      .save()
    assert(AuditSink.stats("dry").get.rows === 4000L)
  }
}
