package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal join operators over the events stream table — the two
  * join shapes a feature/training pipeline hits constantly and plain
  * equi-joins can't express:
  *
  *  - **As-of join** (point-in-time lookup): for each observation,
  *    the most recent fact at-or-before its timestamp — the join
  *    behind leakage-free feature extraction ("what was the user's
  *    last purchase when they clicked?"). The reference has no
  *    temporal surface; this is part of the engine-completeness
  *    mandate (DuckDB ships it as ASOF JOIN, Flink as temporal
  *    joins).
  *  - **Interval/range join**: points matched into time windows with
  *    no equi-key at all.
  *
  * Scale design (100 TB):
  *  - The as-of join is the UNION-MERGE formulation, not a range
  *    join: both sides union into one relation tagged by side, ONE
  *    shuffle on the join key, and a running `last(_, ignoreNulls)`
  *    window carries the most recent right-side row forward into
  *    each left row. Cost is a single sort-shuffle of (key, ts) —
  *    the same price as the sessionize query — versus the
  *    O(lefts × rights-per-key) blowup of the inequality-join
  *    formulation.
  *  - The range join never cross-joins: intervals are exploded into
  *    the fixed-width time buckets they overlap (bounded by
  *    interval_span/bucket + 1 rows each), points map to exactly one
  *    bucket, and the match is a broadcast EQUI-join on bucket_id
  *    refined by the exact containment predicate. A point pairs with
  *    an interval in exactly one bucket (its own), so no dedup pass
  *    is needed.
  */
object Temporal extends graft.QueryGroup {

  private val HourUs = 3600000000L
  private val WindowUs = 2 * HourUs // range-join window: [ts, ts+2h]
  private val NWindows = 50

  /** For each 'click' event: the most recent 'purchase' by the same
    * user at-or-before the click (ties: equal-timestamp purchases
    * count as "before"; among them the highest event_id wins).
    * Clicks with no prior purchase keep a null match. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    // side 0 = right (purchase) sorts before side 1 = left (click) at
    // equal timestamps, so an equal-ts purchase is visible to the
    // click; event_id asc makes the LAST equal-ts purchase the max id.
    val u = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("event_id"), lit(0).as("side"))
      .unionAll(e.where(col("event_type") === "click")
        .select(col("user_id"), col("us"), col("event_id"), lit(1).as("side")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("side").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("matched_id",
        last(when(col("side") === 0, col("event_id")), ignoreNulls = true)
          .over(w))
      .withColumn("matched_us",
        last(when(col("side") === 0, col("us")), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("us"),
        col("matched_id"), (col("us") - col("matched_us")).as("lag_us"))
      .orderBy(col("event_id").asc)
  }

  /** Count/sum events falling inside the 2-hour windows opened by the
    * NWindows highest-value events ("incident windows") — a pure
    * interval containment join with no equi-key, executed as a
    * bucket-exploded broadcast equi-join. */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"), col("value"))
    val anchors = e
      .orderBy(col("value").desc, col("event_id").asc).limit(NWindows)
      .select(col("event_id").as("win_id"), col("us").as("lo"),
        (col("us") + WindowUs).as("hi"))
    // Each interval overlaps at most 3 hour-buckets; a point lives in
    // exactly one — the equi-join key that replaces the cross join.
    val ibuckets = anchors
      .withColumn("bucket", explode(expr(s"sequence(lo DIV $HourUs, hi DIV $HourUs)")))
    e.withColumn("bucket", expr(s"us DIV $HourUs"))
      .join(broadcast(ibuckets), Seq("bucket"))
      .where(col("us").between(col("lo"), col("hi")))
      .groupBy(col("win_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 1e6).cast("long")).as("sv6"))
      .select(col("win_id"), col("n_events"),
        round(col("sv6").cast("double") / 1e6, 6).as("sum_value"))
      .orderBy(col("win_id").asc)
  }

  /** The same as-of semantics through the NATIVE whole-operator
    * path: [[graft.plans.AsofJoinNode]] planned by
    * [[graft.plans.AsofJoinStrategy]] into the sort-merge
    * [[graft.plans.AsofJoinExec]] (hash-clustered + (key, ts, id)
    * sorted children, one O(1)-state forward merge per partition).
    * Hash-identical to [[asofJoin]] and to the LATERAL oracle. */
  def asofJoinNative(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val l = e.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("us"))
    val r = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
        col("us").as("r_us"))
    val node = graft.plans.AsofJoinNode(
      GraftBridge.analyzed(l), GraftBridge.analyzed(r),
      "user_id", "us", "event_id", "r_user", "r_us", "r_id")
    GraftBridge.ofRows(s, node)
      .select(col("event_id"), col("user_id"), col("us"),
        col("matched_id"), (col("us") - col("matched_us")).as("lag_us"))
      .orderBy(col("event_id").asc)
  }

  /** SCD2 validity-interval versioning — the lakehouse dimension-
    * history shape: each (user, event_type) event becomes a version
    * valid from its own timestamp until the NEXT event of the same
    * key (lead window); the latest version stays open (NULL
    * valid_to). One window over a HIGH-CARDINALITY uniform key
    * (users × types) — the scale-safe window shape: state is one
    * lookahead row per task, keys spread across all reducers (unlike
    * the ≤10-key windows TopKWindowRewrite exists to kill). */
  def scd2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us").asc, col("event_id").asc)
    graft.Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("valid_to", lead(col("us"), 1).over(w))
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("us").as("valid_from"), col("valid_to"))
      .orderBy(col("user_id").asc, col("event_type").asc,
        col("valid_from").asc, col("event_id").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> ((s, d) => asofJoin(s, d)),
    "q_asof_join_native" -> ((s, d) => asofJoinNative(s, d)),
    "q_range_join" -> ((s, d) => rangeJoin(s, d)),
    "q_scd2" -> ((s, d) => scd2(s, d)),
  )

  // Oracle formulations are deliberately DIFFERENT algorithms over
  // the same semantics: the as-of is a correlated LATERAL top-1 per
  // left row, the range join a raw inequality join — both infeasible
  // at scale but exact at sf, so they check the merge/bucket plans
  // against an independent derivation.
  private val asofOracle =
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |l AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'click'),
        |r AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, l.us,
        |       m.mid AS matched_id, l.us - m.mus AS lag_us
        |FROM l LEFT JOIN LATERAL (
        |  SELECT r.event_id AS mid, r.us AS mus FROM r
        |  WHERE r.user_id = l.user_id AND r.us <= l.us
        |  ORDER BY r.us DESC, r.event_id DESC LIMIT 1) m ON TRUE
        |ORDER BY l.event_id ASC""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_scd2" ->
      """SELECT user_id, event_type, event_id,
        |       epoch_us(ts) AS valid_from,
        |       lead(epoch_us(ts), 1) OVER (
        |         PARTITION BY user_id, event_type
        |         ORDER BY epoch_us(ts) ASC, event_id ASC) AS valid_to
        |FROM events
        |ORDER BY user_id ASC, event_type ASC, valid_from ASC,
        |         event_id ASC""".stripMargin,
    "q_asof_join" -> asofOracle,
    // identical semantics through the native whole-operator path
    "q_asof_join_native" -> asofOracle,
    "q_range_join" ->
      s"""WITH e AS (SELECT event_id, epoch_us(ts) AS us, value FROM events),
         |a AS (SELECT event_id AS win_id, us AS lo, us + $WindowUs AS hi
         |      FROM e ORDER BY value DESC, event_id ASC LIMIT $NWindows)
         |SELECT a.win_id, count(*) AS n_events,
         |       round(CAST(sum(CAST(round(e.value * 1e6) AS BIGINT)) AS DOUBLE)
         |             / 1e6, 6) AS sum_value
         |FROM a JOIN e ON e.us BETWEEN a.lo AND a.hi
         |GROUP BY a.win_id ORDER BY a.win_id ASC""".stripMargin,
  )
}
