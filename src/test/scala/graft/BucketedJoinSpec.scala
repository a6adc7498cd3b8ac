package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** q_join_bucketed — the stored co-located join. Proves (1) the
  * bucketed plan is shuffle-free up to the presentation sort, (2)
  * results are identical to the plain join over the base tables,
  * (3) a fresh catalog re-attaches the stored files metadata-only
  * (the DDL path) and serves the same rows.
  */
class BucketedJoinSpec extends SparkSuite {

  private def plainRecompute() = {
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
        .where(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        expr("CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
          "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) " +
          "* 100) AS BIGINT)").as("revenue_cents"))
      .orderBy(col("o_orderkey").asc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("q_join_bucketed: zero shuffle up to the presentation sort; " +
      "both scans bucketed; equals the plain join") {
    val df = Relational.joinBucketed(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"expected SMJ, got:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join/agg must not shuffle, got:\n$p")
    assert("Bucketed: true".r.findAllIn(p).size == 2,
      s"both sides must read as bucketed scans, got:\n$p")
    assert(p.contains("EqualTo(o_orderpriority,1-URGENT)"),
      "priority filter must push to the bucketed scan")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === plainRecompute())
    assert(got.nonEmpty)
  }

  test("q_join_bucketed: fresh-catalog re-attach is metadata-only and " +
      "serves identical rows") {
    val before = Relational.joinBucketed(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val fp = Relational.bucketFp(sfDir)
    Seq(s"graft_b_orders_$fp", s"graft_b_lineitem_$fp")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val mtimes = bucketFiles(fp).map(_.lastModified).toSeq
    val after = Relational.joinBucketed(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(after === before)
    // Metadata-only: no data file was rewritten by the re-attach.
    assert(bucketFiles(fp).map(_.lastModified).toSeq === mtimes)
  }

  private def bucketFiles(fp: String): Array[java.io.File] = {
    val base = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_buckets_" +
        s"${new java.io.File(sfDir).getName}_$fp")
    Seq("orders", "lineitem").flatMap(d =>
      Option(new java.io.File(base, d).listFiles()).toSeq.flatten
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)).toArray
  }
}
