package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series preparation operators over the events table — the
  * regularization/resampling shapes a feature or training pipeline
  * needs between raw event logs and model-ready series (the
  * reference has no temporal surface, db/init.sql; this tier is part
  * of the engine-completeness mandate alongside [[Temporal]]):
  *
  *  - **Gap fill + LOCF** (`q_gap_fill`): densify each user's hourly
  *    series onto a regular grid and carry the last observation
  *    forward into the holes — the step that turns an irregular
  *    event log into an aligned feature matrix without leaking
  *    future values backward.
  *  - **OHLC downsample** (`q_ohlc`): per (type, day)
  *    open/high/low/close/volume — resolution reduction where open
  *    and close are order statistics BY TIME, not by value.
  *  - **Sweep-line concurrency** (`q_concurrency`): peak number of
  *    simultaneously-open 30-minute activity windows per type — the
  *    interval-stabbing/occupancy query (capacity planning, rate
  *    limiting, sessionized load).
  *
  * Everything is integer-exact (micro-unit values, epoch-micros
  * time) with fully-ordered deterministic ties, per the repo-wide
  * cross-engine convention.
  *
  * Scale design (100 TB):
  *  - q_gap_fill shuffles once to (user, hour) — map-side-combined,
  *    so the exchange carries at most span/granularity rows per key,
  *    not raw events — then windows per user; grid explosion is
  *    bounded by the span (720 rows/user/month) and generated
  *    lazily by `sequence`, never materialized corpus-wide. State
  *    per window task is one carry value.
  *  - q_ohlc is a single map-side-combining hash aggregate: the
  *    time-ordered open/close ride the same agg as min/max via
  *    lexicographic struct extremes ((us, id, value) min/max), so
  *    there is NO window and NO second pass — the downsample of a
  *    100 TB day is one exchange of (type, day) cells.
  *  - q_concurrency is the SEGMENTED prefix-sum formulation: the
  *    ±1 delta stream sweeps within (type, day) segments (a
  *    high-cardinality window key), per-day totals form a tiny
  *    days-sized table whose running sum is the carry-in joined
  *    back broadcast — two bounded windows replace the
  *    single-reducer-per-type global sort the naive sweep needs
  *    (the oracle IS that naive global sweep, so the decomposition
  *    is graded hash-exact against an independent derivation).
  */
object TimeSeries extends graft.QueryGroup {

  /** Activity-window length for the concurrency sweep. */
  private val IntervalUs = 1800000000L // 30 min
  private val DayUs = 86400000000L

  private def microVal: org.apache.spark.sql.Column =
    round(col("value") * 1e6).cast("long")

  /** q_gap_fill — hourly grid per user between that user's first and
    * last observed hour; each hour carries the LAST observation in
    * it (max by (us, event_id)); holes fill by LOCF. Output is the
    * per-user audit rollup (grid size, observed, filled, and the
    * exact micro-sum of the filled series — the checksum that grades
    * every carried value), so the graded row stays compact while the
    * whole filled series is pinned. */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        microVal.as("m"))
    val obs = e.groupBy(col("user_id"), col("h"))
      .agg(max(struct(col("us"), col("event_id"), col("m")))
        .getField("m").as("m"))
    val grid = obs.groupBy(col("user_id"))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR")))
          .as("h"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "h"), "left")
      .withColumn("fm", last(col("m"), ignoreNulls = true).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_grid"), count(col("m")).as("n_obs"),
        (count(lit(1)) - count(col("m"))).as("n_gap"),
        sum(col("fm")).as("fill_sum_micro"))
      .orderBy(col("user_id").asc)
  }

  /** q_ohlc — per (event_type, epoch-day): open/close = the value of
    * the time-first/time-last event ((us, event_id) lexicographic
    * struct extremes — no window, rides the hash agg), high/low =
    * value extremes, volume = count, exact micro-sum. */
  def ohlc(s: SparkSession, dir: String): DataFrame =
    ohlcAgg(ohlcProject(Tables.events(s, dir)))
      .orderBy(col("event_type").asc, col("d").asc)

  /** The OHLC input projection — shared with the streaming twin so
    * both build the identical candle. */
  private[graft] def ohlcProject(events: DataFrame): DataFrame =
    events.select(col("event_type"),
      expr(s"unix_micros(ts) DIV $DayUs").as("d"),
      unix_micros(col("ts")).as("us"), col("event_id"),
      microVal.as("m"))

  /** The OHLC aggregate — every column is an ASSOCIATIVE extreme /
    * sum (open/close via lexicographic struct min/max), so the same
    * definition serves batch, shards, and continuous maintenance
    * (exact under any micro-batch split — the q_stream_window
    * argument). */
  private[graft] def ohlcAgg(p: DataFrame): DataFrame =
    p.groupBy(col("event_type"), col("d"))
      .agg(
        min(struct(col("us"), col("event_id"), col("m")))
          .getField("m").as("open_micro"),
        max(col("m")).as("high_micro"),
        min(col("m")).as("low_micro"),
        max(struct(col("us"), col("event_id"), col("m")))
          .getField("m").as("close_micro"),
        count(lit(1)).as("volume"),
        sum(col("m")).as("sum_micro"))

  /** q_concurrency — peak simultaneously-open [ts, ts+30m) windows
    * per event type, plus the first instant the peak is reached.
    * Sweep line: each event contributes (+1 at us, −1 at us+30m);
    * the running sum over (t asc, delta asc, event_id asc) — ends
    * close before starts at the same instant, so intervals are
    * half-open — is the occupancy. Executed segmented: within-day
    * running sums under a (type, day) window plus a broadcast
    * days-sized carry table; equal to the global sweep because t
    * orders days monotonically. */
  def concurrency(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"))
    val deltas = e.select(col("event_type"), col("us").as("t"),
        lit(1L).as("d"), col("event_id"))
      .unionAll(e.select(col("event_type"),
        (col("us") + lit(IntervalUs)).as("t"), lit(-1L).as("d"),
        col("event_id")))
      .withColumn("day", expr(s"t DIV $DayUs"))
    val wIn = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("t").asc, col("d").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCarry = Window.partitionBy(col("event_type"))
      .orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val dayTotals = deltas.groupBy(col("event_type"), col("day"))
      .agg(sum(col("d")).as("dt"))
      .withColumn("carry", coalesce(sum(col("dt")).over(wCarry), lit(0L)))
      .select(col("event_type"), col("day"), col("carry"))
    val swept = deltas
      .withColumn("run", sum(col("d")).over(wIn))
      .join(broadcast(dayTotals), Seq("event_type", "day"))
      .withColumn("conc", col("run") + col("carry"))
    val peaks = swept.groupBy(col("event_type"))
      .agg(max(col("conc")).as("max_conc"))
    swept.join(broadcast(peaks), Seq("event_type"))
      .where(col("conc") === col("max_conc"))
      .groupBy(col("event_type"))
      .agg(max(col("max_conc")).as("max_conc"),
        min(col("t")).as("peak_us"))
      .join(e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_intervals")), Seq("event_type"))
      .select(col("event_type"), col("n_intervals"), col("max_conc"),
        col("peak_us"))
      .orderBy(col("event_type").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_gap_fill" -> ((s, d) => gapFill(s, d)),
    "q_ohlc" -> ((s, d) => ohlc(s, d)),
    "q_concurrency" -> ((s, d) => concurrency(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "q_gap_fill" ->
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS h,
        |                  epoch_us(ts) AS us, event_id,
        |                  CAST(round(value * 1e6) AS BIGINT) AS m
        |           FROM events),
        |o AS (SELECT user_id, h,
        |             (max({'us': us, 'eid': event_id, 'm': m})).m AS m
        |      FROM e GROUP BY user_id, h),
        |b AS (SELECT user_id, min(h) AS lo, max(h) AS hi
        |      FROM o GROUP BY user_id),
        |g AS (SELECT user_id,
        |             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |      FROM b),
        |f AS (SELECT g.user_id, o.m,
        |             last_value(o.m IGNORE NULLS) OVER (
        |               PARTITION BY g.user_id ORDER BY g.h ASC
        |               ROWS UNBOUNDED PRECEDING) AS fm
        |      FROM g LEFT JOIN o ON o.user_id = g.user_id AND o.h = g.h)
        |SELECT user_id, count(*) AS n_grid, count(m) AS n_obs,
        |       count(*) - count(m) AS n_gap,
        |       CAST(sum(fm) AS BIGINT) AS fill_sum_micro
        |FROM f GROUP BY user_id ORDER BY user_id ASC""".stripMargin,
    "q_ohlc" ->
      s"""WITH e AS (SELECT event_type, epoch_us(ts) // $DayUs AS d,
         |                  epoch_us(ts) AS us, event_id,
         |                  CAST(round(value * 1e6) AS BIGINT) AS m
         |           FROM events)
         |SELECT event_type, d,
         |       (min({'us': us, 'eid': event_id, 'm': m})).m AS open_micro,
         |       max(m) AS high_micro, min(m) AS low_micro,
         |       (max({'us': us, 'eid': event_id, 'm': m})).m AS close_micro,
         |       count(*) AS volume, CAST(sum(m) AS BIGINT) AS sum_micro
         |FROM e GROUP BY event_type, d
         |ORDER BY event_type ASC, d ASC""".stripMargin,
    // Independent derivation: the NAIVE global sweep — one window per
    // type over all deltas — against the segmented two-pass plan.
    "q_concurrency" ->
      s"""WITH e AS (SELECT event_type, epoch_us(ts) AS us, event_id
         |           FROM events),
         |d AS (SELECT event_type, us AS t, 1 AS dd, event_id FROM e
         |      UNION ALL
         |      SELECT event_type, us + $IntervalUs, -1, event_id FROM e),
         |r AS (SELECT event_type, t,
         |             sum(dd) OVER (PARTITION BY event_type
         |                           ORDER BY t ASC, dd ASC, event_id ASC
         |                           ROWS UNBOUNDED PRECEDING) AS conc
         |      FROM d),
         |m AS (SELECT event_type, max(conc) AS max_conc
         |      FROM r GROUP BY event_type),
         |p AS (SELECT r.event_type, min(r.t) AS peak_us
         |      FROM r JOIN m USING (event_type)
         |      WHERE r.conc = m.max_conc GROUP BY r.event_type),
         |n AS (SELECT event_type, count(*) AS n_intervals
         |      FROM e GROUP BY event_type)
         |SELECT event_type, n_intervals,
         |       CAST(max_conc AS BIGINT) AS max_conc, peak_us
         |FROM m JOIN p USING (event_type) JOIN n USING (event_type)
         |ORDER BY event_type ASC""".stripMargin,
  )
}
