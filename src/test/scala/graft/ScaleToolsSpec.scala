package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bucketing, Skew}

/** The scale tools must provably change the PLAN (salt spread, no
  * exchange) without changing the ANSWER. */
class ScaleToolsSpec extends SparkSuite {

  test("saltedJoin == plain inner join, and salts the join key") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))

    val salted = Skew.saltedJoin(orders, cust, "o_custkey", 8,
      Seq(col("o_orderkey")))
    val plain = orders.join(cust, Seq("o_custkey"))

    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))
    assert(salted.collect().map(key).sorted.toSeq ===
      plain.collect().map(key).sorted.toSeq)

    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), s"join key must carry the salt:\n$p")
  }

  test("co-bucketed sorted tables join with no exchange and no sort") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, sfDir)
          .select(col("o_custkey"), col("o_totalprice")),
        "o_custkey", 8, "graft_bkt_orders")
      Bucketing.writeBucketed(
        Tables.customer(spark, sfDir)
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey", 8, "graft_bkt_cust")

      val j = Bucketing.coLocatedJoin(spark, "graft_bkt_orders",
        "graft_bkt_cust", "o_custkey")
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(!p.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$p")

      // And the answer matches the unbucketed join.
      val plain = Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_totalprice"))
        .join(Tables.customer(spark, sfDir)
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
          Seq("o_custkey"))
      assert(j.count() === plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_cust")
    }
  }
}
