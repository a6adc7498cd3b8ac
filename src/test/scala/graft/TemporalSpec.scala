package graft

import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** The scale-shaped temporal plans (union-merge as-of, bucket-exploded
  * range join) must agree with naive brute-force derivations computed
  * independently in Scala, and their plans must not contain the
  * expensive shapes they exist to avoid.
  */
class TemporalSpec extends SparkSuite {

  test("as-of join matches per-click brute force") {
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val purchases = e.filter(_._3 == "purchase")
    val expected = e.filter(_._3 == "click").map { case (id, u, _, us) =>
      val prior = purchases.filter(p => p._2 == u && p._4 <= us)
      val m = if (prior.isEmpty) None
        else Some(prior.maxBy(p => (p._4, p._1)))
      (id, m.map(_._1), m.map(p => us - p._4))
    }.sortBy(_._1)

    val got = Temporal.asofJoin(spark, sfDir).collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }
    assert(got.toSeq === expected.toSeq)
  }

  test("as-of join plan has no join operator at all (union-merge)") {
    val plan = Temporal.asofJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in as-of plan:\n$plan")
  }

  test("native AsofJoinExec == union-merge as-of join, plan uses the custom operator") {
    val native = Temporal.asofJoinNative(spark, sfDir)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"expected the custom exec:\n$plan")
    assert(!plan.contains("Window"), s"no window in the native path:\n$plan")
    val a = native.collect().map(_.toSeq).toSeq
    val b = Temporal.asofJoin(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("native as-of join honors SQL null semantics on keys and timestamps") {
    import org.apache.spark.sql.GraftBridge
    import spark.implicits._
    // left: clicks incl. a null key and a null ts; right: purchases
    // incl. null-key and null-ts rows that must never match.
    val l = Seq(
      (1L, Option(5L), Option(100L)),
      (2L, Option.empty[Long], Option(100L)),
      (3L, Option(5L), Option.empty[Long]),
      (4L, Option(0L), Option(100L)))
      .toDF("event_id", "user_id", "us")
    val r = Seq(
      (10L, Option(5L), Option(50L)),
      (11L, Option.empty[Long], Option(40L)),
      (12L, Option(5L), Option.empty[Long]),
      (13L, Option(0L), Option(60L)))
      .toDF("r_id", "r_user", "r_us")
    val node = graft.plans.AsofJoinNode(
      GraftBridge.analyzed(l), GraftBridge.analyzed(r),
      "user_id", "us", "event_id", "r_user", "r_us", "r_id")
    val out = GraftBridge.ofRows(spark, node)
      .select(col("event_id"), col("matched_id"))
      .collect().map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
    assert(out(1L) === Some(10L)) // normal match
    assert(out(2L) === None)      // null left key matches nothing
    assert(out(3L) === None)      // null left ts matches nothing
    assert(out(4L) === Some(13L)) // key 0 matches ONLY key-0 purchases
  }

  test("range join matches brute-force interval filter") {
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val anchors = e.sortBy(x => (-x._3, x._1)).take(50)
    val expected = anchors.map { case (id, lo, _) =>
      val in = e.filter(x => x._2 >= lo && x._2 <= lo + 7200000000L)
      (id, in.length.toLong,
        math.round(in.map(x => math.round(x._3 * 1e6)).sum.toDouble / 1e6 * 1e6) / 1e6)
    }.sortBy(_._1)

    val got = Temporal.rangeJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === expected.toSeq)
  }

  test("range join is a broadcast equi-join on bucket, not cartesian") {
    val plan = Temporal.rangeJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
