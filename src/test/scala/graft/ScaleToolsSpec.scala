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

  test("q_skew_audit: hot keys, shares, and load ratios match a " +
      "driver-side recomputation") {
    val rows = graft.operators.Relational.skewAudit(spark, sfDir).collect()
    assert(rows.length === 10)
    // Monotone non-increasing hotness with the key tiebreak.
    val cnts = rows.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts === cnts.sorted.reverse)
    // Recompute the audit arithmetic from the raw per-key counts.
    val counts = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tot = counts.values.sum
    val nk = counts.size.toLong
    val top = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
    rows.zip(top).foreach { case (r, (k, c)) =>
      assert(r.getAs[Long]("key") === k)
      assert(r.getAs[Long]("cnt") === c)
      assert(r.getAs[Long]("share_ppm") ===
        (2 * 1000000L * c + tot) / (2 * tot))
      assert(r.getAs[Long]("x_mean_milli") ===
        (2 * 1000L * c * nk + tot) / (2 * tot))
    }
  }

  test("IndexCache.ensure: concurrent same-JVM callers build ONCE " +
      "and both serve an intact published index") {
    // Regression for the r9 review finding: two threads of one
    // process share a pid, so without the per-path monitor they
    // built into the same tmp tree and could publish a half-written
    // index.
    val out = System.getProperty("java.io.tmpdir") +
      s"/graft_enstest_${System.nanoTime()}"
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def build(tmp: String): Unit = {
      builds.incrementAndGet()
      val d = new java.io.File(tmp); d.mkdirs()
      Thread.sleep(100) // widen the race window
      java.nio.file.Files.writeString(
        new java.io.File(d, "payload").toPath, "42")
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fs = (1 to 2).map(_ => pool.submit(
        new java.util.concurrent.Callable[String] {
          def call(): String = graft.IndexCache.ensure(out)(build)
        }))
      val paths = fs.map(_.get())
      assert(paths.forall(_ == out))
      assert(builds.get() === 1,
        s"expected one build under the monitor, got ${builds.get()}")
      assert(new java.io.File(out, "_built").exists())
      assert(java.nio.file.Files.readString(
        new java.io.File(out, "payload").toPath) === "42")
    } finally {
      pool.shutdownNow()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(out))
    }
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
