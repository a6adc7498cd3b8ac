package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational / OLAP core over the TPC-H-ish star schema — the
  * engine-completeness group. The reference exposes plain-SQL
  * filtering and aggregation alongside its vector search (reference:
  * README.md "Direct SQL Queries"; db/query_example.py:142-171
  * database statistics); this group generalizes that to the standard
  * OLAP shapes: multi-agg scan, star join, top-n per group, rollup,
  * running windows, semi/anti join, time bucketing, sessionization.
  *
  * Scale design (100 TB):
  * - Dimension tables (region, nation) are `broadcast()`; fact-fact
  *   joins (orders⋈lineitem, customer⋈orders) shuffle on their keys
  *   and AQE picks the strategy at runtime.
  * - Aggregations are hash-aggs with map-side combine on bounded or
  *   uniformly distributed keys; top-n per group uses the bounded
  *   [[graft.plans.TopKByScore]] aggregate (map-side partial top-k)
  *   rather than a full window shuffle.
  * - Per-user windows (running sums, sessionization) partition by
  *   user_id whose cardinality grows with the data — no fixed-key
  *   funnel.
  *
  * Float determinism: money columns are cast to exact DECIMAL before
  * aggregation (sums are order-independent), then cast to DOUBLE and
  * rounded for output; free-form doubles (event values) accumulate in
  * fixed-point micro-unit longs. Raw double sums would depend on
  * Spark's partial-aggregation order and flake the oracle hash.
  */
object Relational extends graft.QueryGroup {

  private val one = lit(1).cast("decimal(4,2)")
  private def dec2(c: Column): Column = c.cast("decimal(12,2)")
  private def dec4(c: Column): Column = c.cast("decimal(4,2)")
  /** Exact micro-unit fixed-point accumulator for a free-form double. */
  private def fixedSum(c: Column): Column = sum(round(c * 1e6).cast("long"))

  /** TPC-H Q1-shape pricing summary: multi-aggregate scan with a
    * pushed-down date filter, grouped on (returnflag, linestatus). */
  def q1Pricing(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val disc = dec4(col("l_discount"))
    val tax = dec4(col("l_tax"))
    l.where(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        dec2(col("l_quantity")).as("q"),
        dec2(col("l_extendedprice")).as("p"),
        (dec2(col("l_extendedprice")) * (one - disc)).as("dp"),
        (dec2(col("l_extendedprice")) * (one - disc) * (one + tax)).as("ch"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("q")).cast("double"), 2).as("sum_qty"),
        round(sum(col("p")).cast("double"), 2).as("sum_base_price"),
        round(sum(col("dp")).cast("double"), 2).as("sum_disc_price"),
        round(sum(col("ch")).cast("double"), 2).as("sum_charge"),
        round(sum(col("q")).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(sum(col("p")).cast("double") / count(lit(1)), 6).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)
  }

  /** Star join region⋈nation⋈customer⋈orders⋈lineitem → revenue per
    * (region, nation) for one order year. Dims broadcast; facts
    * shuffle on their join keys. */
  def joinAgg(s: SparkSession, dir: String): DataFrame = {
    val rev = (dec2(col("l_extendedprice")) * (one - dec4(col("l_discount"))))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir)
        .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(rev).cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name").asc, col("n_name").asc)
  }

  /** Top-3 orders by total price per order priority — bounded
    * [[graft.plans.TopKByScore]] aggregate (map-side partial top-k;
    * a window over 5 fixed keys would shuffle the whole fact table
    * onto 5 reducers). */
  def topNGroup(s: SparkSession, dir: String, k: Int = 3): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(graft.plans.TopKByScore(col("o_totalprice"), col("o_orderkey"), k)
        .as("tk"))
      .select(col("o_orderpriority"), posexplode(col("tk")))
      .select(col("o_orderpriority"), col("col.id").as("o_orderkey"),
        round(col("col.score"), 2).as("o_totalprice"),
        (col("pos") + 1).cast("int").as("rnk"))
      .orderBy(col("o_orderpriority").asc, col("rnk").asc)

  /** Top-N per group written the NATURAL way — a row_number window +
    * rank filter. The [[graft.plans.TopKWindowRewrite]] optimizer
    * rule (GraftExtensions) replaces the full-shuffle window with the
    * bounded [[graft.plans.TopKRows]] aggregate at plan time
    * (PlanSpec asserts no Window survives), so the declarative
    * formulation and the hand-tuned [[topNGroup]] execute the same
    * scale-safe plan. */
  def topNWindow(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
      .where(col("rnk") <= k)
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("rnk"))
      .orderBy(col("o_orderpriority").asc, col("rnk").asc)
  }

  /** Hierarchical ROLLUP (region → nation) over customer account
    * balances: grand total, per-region, per-nation rows. */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum(dec2(col("c_acctbal"))).cast("double"), 2).as("sum_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  /** Full CUBE (market segment × order priority) over order counts
    * and totals — the grouping-sets completeness twin of [[rollupAgg]]
    * (same broadcast-dim + hash-agg plan; the cube expansion is
    * map-side). */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(dec2(col("o_totalprice"))).cast("double"), 2).as("sum_price"))
      .orderBy(col("c_mktsegment").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** q_grouping_sets — NON-HIERARCHICAL grouping sets
    * ((returnflag), (linestatus)): the two independent marginal
    * rollups neither `rollup` (hierarchical prefixes) nor `cube`
    * (all 4 subsets) expresses without waste — cube would compute
    * and discard the (flag, status) and () cells. `grouping_id`
    * disambiguates which marginal a row belongs to (1 = status
    * aggregated away, 2 = flag aggregated away — same bitmask both
    * engines). Revenue follows the repo cent-exact convention:
    * exact DECIMAL per item, exact DECIMAL sum, one terminal round.
    * Plan: ONE map-side-combining hash aggregate over the expanded
    * grouping-set rows — at 100 TB this is one exchange of
    * (|flags| + |statuses|) cells, vs two full scans for the
    * UNION-ALL-of-two-group-bys a user would hand-write. */
  def groupingSetsAgg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        (dec2(col("l_extendedprice")) * (one - dec4(col("l_discount"))))
          .as("dp"))
    li.groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n_items"),
        expr("CAST(round(sum(dp) * 100) AS BIGINT)").as("revenue_cents"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
        col("n_items"), col("revenue_cents"))
      .orderBy(col("gid").asc, col("l_returnflag").asc_nulls_last,
        col("l_linestatus").asc_nulls_last)
  }

  /** Running sum + inter-event gap per user over event time; the
    * window partitions on user_id (cardinality grows with data).
    * Running value accumulates in exact micro-units — an ordered
    * running double sum is sequential, but the micro-unit long keeps
    * it integer-exact so oracle parity is bitwise. */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, dir)
      .where(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 1e6).cast("long").as("v6"),
        unix_micros(col("ts")).as("us"))
      .select(col("user_id"), col("event_id"),
        round((sum(col("v6")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("double") / 1e6), 6).as("running_value"),
        (col("us") - lag(col("us"), 1).over(w)).as("gap_us"))
      .orderBy(col("user_id").asc, col("event_id").asc)
  }

  /** Semi/anti join: per market segment, customers WITH at least one
    * urgent order vs customers WITHOUT any (left_semi / left_anti on
    * the same filtered fact side). */
  def semiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val urgent = Tables.orders(s, dir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    def side(tag: String, joinType: String): DataFrame =
      c.join(urgent, col("c_custkey") === col("o_custkey"), joinType)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          round(sum(dec2(col("c_acctbal"))).cast("double"), 2).as("sum_bal"))
        .select(lit(tag).as("tag"), col("c_mktsegment"), col("n_cust"),
          col("sum_bal"))
    side("has_urgent", "left_semi").unionAll(side("no_urgent", "left_anti"))
      .orderBy(col("tag").asc, col("c_mktsegment").asc)
  }

  /** Time-bucketed event aggregation (batch twin of the streaming
    * windowed agg): hourly buckets × event type. */
  def eventsBucket(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round((fixedSum(col("value")).cast("double") / 1e6), 6).as("sum_value"))
      .orderBy(col("bucket").asc, col("event_type").asc)

  /** Telemetry spike detection over the event stream — the
    * operational-monitoring face of the hourly rollup: flag every
    * (event_type, hour) bucket whose count exceeds its type's mean by
    * more than 3 standard deviations, entirely in INTEGER arithmetic
    * so both engines agree exactly: with n buckets, S = Σc,
    * SS = Σc², the test `c > μ + 3σ` is
    * `(c·n − S)² > 9·(n·SS − S²)` and `c·n > S` — no floating-point
    * mean/stddev anywhere. The squared terms ride on DECIMAL(38,0)
    * (Spark) / HUGEINT (DuckDB) — the timeDecay/collocations
    * wide-integer pattern — so per-bucket counts up to ~10¹² at the
    * 100 TB/day telemetry scale stay exact instead of silently
    * wrapping BIGINT.
    *
    * Scale: the only corpus-sized operation is the first
    * (type, hour) count — one shuffle with map-side partial
    * aggregation; the per-type moments reduce the bucket table
    * (|types| × |hours|, ~thousands of rows at any corpus size) and
    * join back as a BROADCAST. At 100 TB/day of telemetry the bucket
    * table is still tiny — the stats side never shuffles the data. */
  def anomalyHours(s: SparkSession, dir: String): DataFrame = {
    val buckets = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("c"))
    val stats = buckets.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"))
    def d(c: String) = col(c).cast("decimal(38,0)")
    buckets.join(broadcast(stats), "event_type")
      .where(col("c") * col("n") > col("s") &&
        (d("c") * d("n") - d("s")) * (d("c") * d("n") - d("s")) >
          lit(9L).cast("decimal(38,0)") * (d("n") * d("ss") - d("s") * d("s")))
      .select(col("event_type"), col("bucket"), col("c").as("n_events"))
      .orderBy(col("bucket").asc, col("event_type").asc)
  }

  /** q_changepoint — CHANGEPOINT detection over the event stream
    * (the level-shift companion to [[anomalyHours]]' spike test —
    * "when did this metric's regime change", the question behind
    * every deploy/incident timeline): per event type, over the
    * hourly count series, find the bucket boundary that maximizes
    * the between-segment mean gap — the classic two-sample split
    * scan (CUSUM's maximum form), entirely in exact integer
    * arithmetic: with m buckets, prefix sum S1 at split k,
    * total S, the score is |S1·n2 − S2·n1| · 1e6 DIV (n1·n2) — the
    * before/after mean difference in micro-events, no floats. Emits
    * per type the argmax split (the LAST bucket of the before
    * segment), segment sizes, both segment means in micro-events,
    * and the gap.
    * Products ride DECIMAL(38,0) (1e12-event buckets × 1e4-bucket
    * histories stay exact — the anomalyHours/timeDecay pattern).
    *
    * Scale: the only corpus-sized op is the (type, hour) count — one
    * map-side-combined shuffle; the split scan is a window
    * cumulative sum + map-only scoring + one argmax agg over the
    * tiny bucket table (|types|×|hours| rows at any corpus size). */
  def changepoint(s: SparkSession, dir: String): DataFrame =
    changepointScan(Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("c")))

  /** The split scan over ANY (event_type, bucket, c) hourly-count
    * relation — shared by the batch row and the streaming twin
    * (whose maintained window state IS this relation). */
  private[graft] def changepointScan(b: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("bucket").asc)
    val wAll = Window.partitionBy(col("event_type"))
    val scored = b
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("s1", sum(col("c")).over(w))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("s", sum(col("c")).over(wAll))
      .where(col("k") < col("m")) // split AFTER bucket k; k = 1..m-1
      .select(col("event_type"), col("bucket"), col("k"),
        (col("m") - col("k")).as("n2"), col("s1"),
        (col("s") - col("s1")).as("s2"))
      .select(col("event_type"), col("bucket"), col("k"), col("n2"),
        col("s1"), col("s2"),
        // IntegralDivide on decimals — truncation parity with the
        // oracle's HUGEINT `//` (the wide-integer pattern).
        expr("""CAST(abs(CAST(s1 AS DECIMAL(38,0)) * n2 -
                        CAST(s2 AS DECIMAL(38,0)) * k) * 1000000
                DIV (CAST(k AS DECIMAL(38,0)) * n2) AS BIGINT)""")
          .as("gap_micro"))
    val best = Window.partitionBy(col("event_type"))
      .orderBy(col("gap_micro").desc, col("bucket").asc)
    scored
      .withColumn("rn", row_number().over(best))
      .where(col("rn") === 1)
      .select(col("event_type"), col("bucket").as("split_bucket"),
        col("k").as("n_before"), col("n2").as("n_after"),
        expr("""CAST(CAST(s1 AS DECIMAL(38,0)) * 1000000 DIV k AS BIGINT)""")
          .as("mean_before_micro"),
        expr("""CAST(CAST(s2 AS DECIMAL(38,0)) * 1000000 DIV n2 AS BIGINT)""")
          .as("mean_after_micro"),
        col("gap_micro"))
      .orderBy(col("event_type").asc)
  }

  /** Bit-interleave of two 8-bit bucket columns into a 16-bit
    * Z-value — the Morton curve, as a plain integer expression
    * (shift/mask/add, codegen'd on Spark, same arithmetic in the
    * DuckDB oracle). */
  private def zExpr(a: String, b: String): String =
    (0 until 8).map(i =>
      s"(shiftleft((shiftright($a, $i) & 1), ${2 * i + 1}) + " +
        s"shiftleft((shiftright($b, $i) & 1), ${2 * i}))").mkString(" + ")

  /** q_zorder — Z-ORDER layout audit (the Delta/Iceberg
    * `OPTIMIZE ZORDER BY` lever): assign each event to the file a
    * Morton-curve sort on (user_id, value) would place it in, and
    * emit the per-file min/max footer stats a reader's file-skipping
    * would consult. Each dim is ranged into 8 bits by exact integer
    * division against the global min/max (value via its cent
    * fixed-point); the 16-bit Z-value DIV 256 is the file id — every
    * file covers one 16×16 Z-square, so a point predicate on EITHER
    * dim overlaps only the ~16/256 files whose square crosses it,
    * which is the property a single-dim sort cannot give the second
    * dim (spec asserts both-dim pruning from these stats; a
    * linear-sort layout prunes only its own sort key).
    *
    * Scale: one broadcast min/max row, one map-only projection
    * computing the Z-value (pure integer shift/add inside
    * whole-stage codegen), one ≤256-key agg. At 100 TB the same
    * projection feeds a repartitionByRange(z) write instead of the
    * audit agg — the stats here are exactly the parquet footers that
    * layout produces. */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("user_id"),
      round(col("value") * 100).cast("long").as("vc"))
    val r = e.agg(min(col("user_id")).as("mnu"), max(col("user_id")).as("mxu"),
      min(col("vc")).as("mnv"), max(col("vc")).as("mxv"))
    e.crossJoin(broadcast(r))
      .select(col("user_id"), col("vc"),
        expr("CAST((user_id - mnu) * 256 div (mxu - mnu + 1) AS INT)")
          .as("a8"),
        expr("CAST((vc - mnv) * 256 div (mxv - mnv + 1) AS INT)").as("b8"))
      .select(col("user_id"), col("vc"),
        expr(s"CAST((${zExpr("a8", "b8")}) div 256 AS BIGINT)").as("file_id"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("user_id")).as("min_u"), max(col("user_id")).as("max_u"),
        min(col("vc")).as("min_vc"), max(col("vc")).as("max_vc"))
      .orderBy(col("file_id").asc)
  }

  /** Output-file size target for [[compactionPlan]], in chars of the
    * modeled inventory. */
  private[graft] val CompactTarget = 2000L

  /** q_compaction — small-file COMPACTION PLANNER (the lakehouse
    * `OPTIMIZE`/binpack lever, q_zorder's sibling): treat each
    * document as a raw ingest drop (file id = doc_id, bytes = text
    * length) in its source's partition, and assign files to output
    * bins by deterministic sequential packing — per source, walk
    * files in id order and start a new bin each time the running
    * byte offset crosses [[CompactTarget]] (a file straddling the
    * boundary stays in the bin its start offset lies in, the
    * standard greedy rule — bins may overfill by < one file, never
    * underfill while input remains). Emits the per-(source, bin)
    * manifest: file count, bytes, id span, fill ratio in ppm — the
    * rewrite task list an OPTIMIZE job executes.
    *
    * Scale: compaction planning is METADATA work — the inventory is
    * one row per file, millions of rows at 100 TB, not the data
    * itself. One exchange on source, one within-partition running
    * sum (partitioned window on the high-cardinality source key —
    * never a global window), one counting agg. The pack preserves id
    * order inside each source, so compacted files keep ingest
    * locality (the property that keeps time-range skipping effective
    * after the rewrite). */
  def compactionPlan(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        length(col("text")).cast("long").as("bytes"))
      .withColumn("cum", sum(col("bytes")).over(w))
      .select(col("source"), col("doc_id"), col("bytes"),
        expr(s"(cum - bytes) DIV ${CompactTarget}L").as("bin"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("tot_bytes"),
        min(col("doc_id")).as("first_file"),
        max(col("doc_id")).as("last_file"))
      .withColumn("fill_ppm",
        expr(s"1000000 * tot_bytes DIV ${CompactTarget}L"))
      .orderBy(col("source").asc, col("bin").asc)
  }

  /** Gap-based sessionization: a session breaks after >30 min of user
    * inactivity. lag → new-session flag → running session index →
    * per-session rollup. Two narrow windows on user_id. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val gapUs = 30L * 60L * 1000000L
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("is_new",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("sess_idx", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        (max(col("us")) - min(col("us"))).as("dur_us"))
      .orderBy(col("user_id").asc, col("sess_idx").asc)
  }

  /** q_event_funnel — ordered-step conversion funnel view → click →
    * purchase: a user reaches step k+1 only with an event STRICTLY
    * AFTER their step-k time (the product-analytics semantics, not
    * set intersection — a purchase before the first view does not
    * convert). One row per step with users reached and conversion
    * ppm vs step 1.
    *
    * Shape: per-step conditional min-aggregations chained by joins
    * that all key on user_id — one shuffle partitioning reused down
    * the chain (co-partitioned joins, no re-exchange), then a
    * 3-row rollup. Per-user state is one timestamp per step, so the
    * funnel scales with users, never with events per user. */
  def eventFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val t1 = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val t2 = e.where(col("event_type") === "click")
      .join(t1, "user_id").where(col("us") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
    val t3 = e.where(col("event_type") === "purchase")
      .join(t2, "user_id").where(col("us") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
    val counts = t1.agg(count(lit(1)).as("n")).select(lit("1_view").as("step"), col("n"))
      .unionAll(t2.agg(count(lit(1)).as("n")).select(lit("2_click").as("step"), col("n")))
      .unionAll(t3.agg(count(lit(1)).as("n")).select(lit("3_purchase").as("step"), col("n")))
    funnelRollup(counts)
  }

  /** (step, n) counts → the funnel output rows (n_users + conversion
    * ppm vs step 1): a 3-row global window (single tiny partition —
    * bounded by the step count, no cartesian, no collect) reads
    * step 1's count as the denominator. Shared with the streaming
    * twin so the rollup cannot drift between them. */
  private[graft] def funnelRollup(counts: DataFrame): DataFrame =
    counts
      .withColumn("n1", greatest(first(col("n")).over(
        Window.orderBy(col("step").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)),
        lit(1L)))
      .select(col("step"), col("n").as("n_users"),
        expr("(2 * 1000000 * n + n1) DIV (2 * n1)").as("conv_ppm"))
      .orderBy(col("step").asc)

  /** q_retention — weekly cohort retention matrix: cohort = epoch
    * week of a user's first event; each (cohort, week-offset) cell
    * counts the cohort's users active that week, with retention ppm
    * vs the cohort's own week-0 size.
    *
    * Shape: distinct (user, week) activity → per-user min-week
    * (both keyed on user_id, exchange reused) → co-partitioned join
    * → cell counts. Cohort sizes are a ≤weeks-sized table joined
    * back broadcast. Per-user state is one long; cells are bounded
    * by weeks², not data. */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val wkUs = 7L * 86400L * 1000000L
    val act = Tables.events(s, dir)
      .select(col("user_id"),
        expr(s"unix_micros(ts) DIV ${wkUs}L").as("wk"))
      .distinct()
    val first0 = act.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    val cells = act.join(first0, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = cells.where(col("wk_offset") === 0L)
      .select(col("cohort_wk"), col("n_users").as("n0"))
    cells.join(broadcast(sizes), "cohort_wk")
      .select(col("cohort_wk"), col("wk_offset"), col("n_users"),
        expr("(2 * 1000000 * n_users + n0) DIV (2 * n0)").as("retained_ppm"))
      .orderBy(col("cohort_wk").asc, col("wk_offset").asc)
  }

  /** q_time_decay — recency-weighted event rollup: each event's
    * weight HALVES per week of age relative to the newest event (the
    * freshness prior of trending/decay scoring). The half-life decay
    * is integer-EXACT: weight_ppm = 1000000 >> age_weeks (a shift,
    * clamped to 62 — Java's long shift is mod-64, so an unclamped
    * 64-week-old event would wrap to full weight while DuckDB
    * saturates to 0), values fixed-pointed to micro-units per row,
    * and the decayed mass accumulated as DECIMAL(38,0) products
    * (micro × ppm overflows BIGINT at ~100k events already).
    *
    * Scale: the reference timestamp is a one-row broadcast; scoring
    * is map-only; one map-side-combined agg on the bounded
    * event_type key. */
  def timeDecay(s: SparkSession, dir: String): DataFrame = {
    val wkUs = 7L * 86400L * 1000000L
    val e = Tables.events(s, dir).select(col("event_type"),
      unix_micros(col("ts")).as("us"),
      round(col("value") * 1e6).cast("long").as("m"))
    val ref = e.agg(max(col("us")).as("ref"))
    e.crossJoin(broadcast(ref))
      .select(col("event_type"), col("m"),
        expr(s"shiftright(1000000L, cast(least((ref - us) DIV ${wkUs}L, " +
          "62L) as int))").as("w"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // The weight sum also rides DECIMAL: Spark's sum(long) wraps
        // silently at ~9.2e12 same-week events (DuckDB promotes to
        // HUGEINT on its own).
        expr("CAST(sum(CAST(w AS DECIMAL(38,0))) AS BIGINT)")
          .as("sum_w_ppm"),
        expr("""CAST(sum(CAST(m AS DECIMAL(38,0)) * w) div 1000000
                AS BIGINT)""").as("decayed_value_micro"))
      .orderBy(col("event_type").asc)
  }

  private val BucketN = 8

  /** Fingerprint of the orders+lineitem parquet (name/size/mtime) so
    * a regenerated dataset can never serve stale bucketed tables —
    * the [[Ann.resIvfPqIndexPath]] discipline. */
  /** Stored-layout version for [[joinBucketed]] — bump on ANY change
    * to the bucketed tables' projection, types, or bucket count so a
    * warm /tmp cache can never serve files written under the old
    * layout (the fingerprint alone only keys the SOURCE data; Spark
    * would trust a stale CLUSTERED BY registration and silently
    * mis-join). */
  private val BucketLayout = s"v1:b$BucketN:k,o_orderpriority|k,dp-dec16.4"

  private[graft] def bucketFp(dir: String): String = {
    val sig = BucketLayout + "||" +
      Seq("orders.parquet", "lineitem.parquet").map { n =>
      val f = new java.io.File(dir, n)
      val files: Array[java.io.File] =
        if (f.isDirectory) f.listFiles().sortBy(_.getName) else Array(f)
      files.map(x => s"${x.getName}:${x.length}:${x.lastModified}")
        .mkString("|")
    }.mkString("||")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
  }

  /** Register table `t` over `path`, building it with `build` only
    * when the bucketed files are absent for this exact data;
    * otherwise attach the existing files with a CLUSTERED BY DDL (the
    * bucket ids live in the file names Spark's bucketed write
    * produced, so re-registration is metadata-only).
    *
    * The probe-or-build is guarded twice: a per-path JVM monitor
    * serializes threads of THIS process (java.nio file locks are
    * held per-JVM — a second same-process locker gets
    * OverlappingFileLockException, not blocking; r9 review item),
    * and an OS file lock on a sibling `.lock` file serializes
    * other PROCESSES sharing this host's /tmp cache — so neither
    * interleaved overwrite builds nor attaching a half-written
    * table can happen. The loser of either race blocks, then sees
    * `_SUCCESS` and attaches metadata-only. */
  private val bucketLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def ensureBucketed(s: SparkSession, t: String, path: String,
      ddlCols: String, build: => Unit): Unit = {
    if (s.catalog.tableExists(t)) return
    val jvmLock = bucketLocks.computeIfAbsent(path, _ => new Object)
    jvmLock.synchronized {
      val lockFile = new java.io.File(path + ".lock")
      lockFile.getParentFile.mkdirs()
      val ch = java.nio.channels.FileChannel.open(lockFile.toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val lk = ch.lock()
      try {
        if (!s.catalog.tableExists(t)) {
          if (new java.io.File(path, "_SUCCESS").exists())
            s.sql(s"""CREATE TABLE $t ($ddlCols) USING parquet
                     |CLUSTERED BY (k) SORTED BY (k) INTO $BucketN BUCKETS
                     |LOCATION '$path'""".stripMargin.replace("\n", " "))
          else build
        }
      } finally { lk.release(); ch.close() }
    }
  }

  /** q_join_bucketed — the CO-LOCATED join: orders and lineitem
    * stored bucketed (and sorted) on the order key, so the fact-fact
    * join that normally costs the biggest shuffle in the warehouse
    * runs with ZERO shuffle exchange — the bucketed scans already
    * satisfy the join's distribution AND the downstream per-order
    * aggregation's, so the only exchange in the whole plan is the
    * final presentation sort. At 100 TB this is the difference
    * between re-shuffling both fact tables on every query and
    * paying the layout once at ingest: build once per dataset
    * (fingerprinted path, reused across executions; re-attached to a
    * fresh catalog by metadata-only DDL), probe many.
    *
    * The stored tables are PRUNED projections (key + the two columns
    * the query family needs) — at scale the bucketed copy is a
    * covering index, not a second copy of the corpus. Revenue math
    * follows the q1/q_join_agg convention: exact DECIMAL per item,
    * exact DECIMAL sum, one terminal round to integer cents. */
  def joinBucketed(s: SparkSession, dir: String): DataFrame = {
    val fp = bucketFp(dir)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_buckets_" +
      s"${new java.io.File(dir).getName}_$fp"
    val to = s"graft_b_orders_$fp"
    val tl = s"graft_b_lineitem_$fp"
    ensureBucketed(s, to, s"$base/orders",
      "k BIGINT, o_orderpriority STRING", {
        Tables.orders(s, dir)
          .select(col("o_orderkey").as("k"), col("o_orderpriority"))
          .write.mode("overwrite").option("path", s"$base/orders")
          .bucketBy(BucketN, "k").sortBy("k").saveAsTable(to)
      })
    ensureBucketed(s, tl, s"$base/lineitem",
      "k BIGINT, dp DECIMAL(16,4)", {
        Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("k"),
            (dec2(col("l_extendedprice")) * (one - dec4(col("l_discount"))))
              .cast("decimal(16,4)").as("dp"))
          .write.mode("overwrite").option("path", s"$base/lineitem")
          .bucketBy(BucketN, "k").sortBy("k").saveAsTable(tl)
      })
    s.table(tl)
      .join(s.table(to).where(col("o_orderpriority") === "1-URGENT")
        .select(col("k")).hint("merge"), Seq("k"))
      .groupBy(col("k").as("o_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        expr("CAST(round(sum(dp) * 100) AS BIGINT)").as("revenue_cents"))
      .orderBy(col("o_orderkey").asc)
  }

  private val PivotStatuses = Seq("F", "O", "P")

  /** Status × priority pivot (wide crosstab): order counts and exact
    * cent-unit revenue per cell. Pivot values are DECLARED, not
    * discovered — at 100 TB the values-discovery pass a blind
    * `pivot(col)` runs is a full extra scan, and the declared form
    * compiles to one map-side-combining aggregate with CASE columns
    * (no shuffle beyond the 5-key groupBy). */
  def pivotAgg(s: SparkSession, dir: String): DataFrame = {
    val pivoted = Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", PivotStatuses)
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("cents"))
    // A (priority, status) cell with no orders pivots to NULL, but the
    // CASE-aggregate form (and the oracle) counts it as 0 — coalesce so
    // the crosstab is total, not data-dependent.
    val cells = PivotStatuses.flatMap(v => Seq(s"${v}_cnt", s"${v}_cents"))
    pivoted
      .select(col("o_orderpriority") +: cells.map(c =>
        coalesce(col(c), lit(0L)).as(c)): _*)
      .orderBy(col("o_orderpriority").asc)
  }

  /** Exact p25/p50/p75 of quantity per returnflag. Scale note: exact
    * percentile is only 100 TB-safe because the measure is LOW
    * CARDINALITY (≤50 distinct quantities — the aggregate buffers a
    * value→count map, not the rows); for unbounded measures use the
    * fixed-boundary histogram (q_quality_hist) or the mergeable HDR
    * quantile sketch ([[Sketches.hdrQuantile]]). Quantities are
    * integral and the
    * quartile fractions dyadic, so the interpolated results are
    * exact doubles on both engines. */
  def percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        percentile(col("l_quantity"), lit(0.25)).as("p25"),
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.75)).as("p75"))
      .orderBy(col("l_returnflag").asc)

  /** JSON property extraction over the events `props` column — the
    * semi-structured surface every analytics engine needs: parse
    * `$.k`, aggregate per event type. Map-side extraction (no UDF —
    * `get_json_object` is a codegen'd expression), 5-key agg. */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type").asc)

  /** RANGE-frame window: per event, count and exact fixed-point
    * value sum over the same user's PRECEDING hour — the value-based
    * frame (RANGE, not ROWS) that sliding-window features use.
    * Partitioned on user_id (cardinality grows with data); ties in
    * `us` get identical frames by definition, so the result is
    * deterministic without a tiebreak in the ORDER BY. */
  def windowRange(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-hourUs, 0)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 1e6).cast("long").as("v6"))
      .select(col("user_id"), col("event_id"), col("us"),
        count(lit(1)).over(w).as("n_1h"),
        round(sum(col("v6")).over(w).cast("double") / 1e6, 6).as("sv_1h"))
      .orderBy(col("event_id").asc)
  }

  /** INTERSECT / EXCEPT set operations over behavioral cohorts:
    * users who both clicked and purchased, clicked only, purchased
    * only. Spark plans these as distinct + semi/anti joins on
    * user_id — shuffle keys with unbounded cardinality. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    def who(t: String) = e.where(col("event_type") === t)
      .select(col("user_id"))
    val clicks = who("click")
    val buys = who("purchase")
    def tag(df: DataFrame, t: String) =
      df.agg(count(lit(1)).as("n_users")).select(lit(t).as("cohort"),
        col("n_users"))
    tag(clicks.intersect(buys), "both")
      .unionAll(tag(clicks.except(buys), "click_only"))
      .unionAll(tag(buys.except(clicks), "purchase_only"))
      .orderBy(col("cohort").asc)
  }

  /** Order-sensitive string aggregation (LISTAGG/string_agg): each
    * user's event-type journey in (time, id) order. Spark has no
    * ordered string_agg aggregate — the deterministic twin is
    * collect_list(struct) → sort_array → transform → concat_ws, all
    * codegen'd expressions over one hash-agg on user_id. */
  def stringAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        concat_ws(",", transform(
          sort_array(collect_list(struct(col("us"), col("event_id"),
            col("event_type")))),
          x => x.getField("event_type"))).as("journey"))
      .orderBy(col("user_id").asc)

  /** Gap sessionization via Spark's NATIVE `session_window` operator
    * — the third formulation of the same semantics (q_sessionize:
    * lag+cumsum windows; q_stream_sessionize: custom fMGWS state;
    * here: the built-in merging session aggregate, which plans as a
    * map-side partial session merge and works identically in
    * streaming). Session end = last event + gap by definition, so
    * last_us = end − 30 min reproduces the batch formulation's
    * bounds exactly. */
  def sessionWindow(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60L * 1000000L
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        (unix_micros(col("session_window.end")) - gapUs).as("last_us"),
        col("n_events"))
      .orderBy(col("user_id").asc, col("start_us").asc)
  }

  /** Orders⋈customer revenue per market segment THROUGH the salted
    * join ([[Skew.saltedJoin]]): every left row carries a
    * deterministic xxhash64 salt, the broadcast-sized right side
    * replicates 8×, and the join key becomes (custkey, salt) — a hot
    * customer's rows spread over 8 reducers instead of one. The
    * result is row-identical to the plain join (the oracle IS the
    * plain join), so this row grades the skew-mitigation plan
    * end-to-end: same answer, spread exchange. Exact cent-unit
    * revenue so the aggregate is partition-order-independent. */
  def saltedJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    Skew.saltedJoin(orders, cust, "o_custkey", 8,
      Seq(col("o_custkey"), col("cents")))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
      .orderBy(col("c_mktsegment").asc)
  }

  /** Hot-key SKEW AUDIT — the diagnostic that decides when
    * [[saltedJoinAgg]]'s mitigation is needed (at 100 TB you measure
    * skew BEFORE a join melts one reducer, not after): per-key order
    * counts on the join key, the top-10 hottest keys by a bounded
    * TakeOrdered cut, and each hot key's exact load ratio vs the
    * mean key (integer milli-units via the round-half-up
    * (2a+b) DIV 2b rule, so the ratio hash-matches cross-engine)
    * plus its corpus share in ppm.
    *
    * Scale: ONE map-side-combined agg on the (uniformly hashed) key,
    * a 10-row TakeOrdered cut, a one-row totals broadcast — the
    * corpus never shuffles twice and nothing scales with key
    * cardinality past the counts agg. */
  def skewAudit(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val counts = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("tot"),
      count(lit(1)).as("nk"))
    counts.orderBy(col("cnt").desc, col("key").asc).limit(k)
      .crossJoin(broadcast(tot))
      .select(col("key"), col("cnt"),
        expr("(2 * 1000000 * cnt + tot) DIV (2 * tot)").as("share_ppm"),
        expr("(2 * 1000 * cnt * nk + tot) DIV (2 * tot)").as("x_mean_milli"))
      .orderBy(col("cnt").desc, col("key").asc)
  }

  /** The column set [[tableStats]] profiles — the non-float,
    * non-timestamp lineitem columns (float/timestamp min/max STRING
    * renders are the one thing the two engines format differently;
    * a deployment profiles those as typed min/max instead). */
  private[graft] val StatsCols = Seq("l_orderkey", "l_partkey",
    "l_suppkey", "l_linenumber", "l_returnflag", "l_linestatus")

  /** q_table_stats — ANALYZE-style CATALOG STATISTICS collection,
    * one row per profiled column: row count, null count, exact NDV,
    * min/max (as strings, one schema for every column type) and the
    * mean rendered width in micro-chars. These are the numbers a
    * cost-based optimizer plans from (join ordering, broadcast
    * decisions, selectivity) — the q_skew_audit of column-level
    * metadata.
    *
    * Shape: ONE aggregate pass computes every column's stats
    * simultaneously (Catalyst plans the N distinct aggregates as one
    * Expand — N rows per input row — plus a single partial+final
    * agg; still one scan, map-side combined), then a map-only
    * explode unpivots the wide row into the per-column layout.
    *
    * Scale: at 100 TB the exact-NDV Expand is the expensive arm —
    * the deployment swap is q_hll_distinct's mergeable registers
    * (one pass, no Expand, 2% error) for NDV, and parquet footer
    * metadata for min/max/null counts (a metadata-only scan, no data
    * read at all); the output contract stays identical, which is
    * why the row is graded on the exact path. */
  def tableStats(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.lineitem(s, dir)
    val aggs = count(lit(1)).as("n_rows") +: StatsCols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"),
        sum(length(col(c).cast("string"))).as(s"len_$c"))
    }
    val wide = t.agg(aggs.head, aggs.tail: _*)
    val arms = StatsCols.map(c => struct(
      lit(c).as("col_name"), col("n_rows"),
      (col("n_rows") - col(s"cnt_$c")).as("n_null"),
      col(s"ndv_$c").as("ndv"),
      col(s"min_$c").as("min_v"), col(s"max_$c").as("max_v"),
      expr(s"1000000 * len_$c DIV cnt_$c").as("avg_len_micro")))
    wide.select(explode(array(arms: _*)).as("r")).select(col("r.*"))
      .orderBy(col("col_name").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_table_stats" -> ((s, d) => tableStats(s, d)),
    "q_salted_join" -> ((s, d) => saltedJoinAgg(s, d)),
    "q_skew_audit" -> ((s, d) => skewAudit(s, d)),
    "q1_pricing" -> ((s, d) => q1Pricing(s, d)),
    "q_pivot" -> ((s, d) => pivotAgg(s, d)),
    "q_percentile" -> ((s, d) => percentiles(s, d)),
    "q_session_window" -> ((s, d) => sessionWindow(s, d)),
    "q_json_extract" -> ((s, d) => jsonExtract(s, d)),
    "q_window_range" -> ((s, d) => windowRange(s, d)),
    "q_set_ops" -> ((s, d) => setOps(s, d)),
    "q_string_agg" -> ((s, d) => stringAgg(s, d)),
    "q_join_agg" -> ((s, d) => joinAgg(s, d)),
    "q_top_n_group" -> ((s, d) => topNGroup(s, d)),
    "q_top_n_window" -> ((s, d) => topNWindow(s, d)),
    "q_rollup" -> ((s, d) => rollupAgg(s, d)),
    "q_cube" -> ((s, d) => cubeAgg(s, d)),
    "q_grouping_sets" -> ((s, d) => groupingSetsAgg(s, d)),
    "q_window_running" -> ((s, d) => windowRunning(s, d)),
    "q_semi_anti" -> ((s, d) => semiAnti(s, d)),
    "q_events_bucket" -> ((s, d) => eventsBucket(s, d)),
    "q_anomaly" -> ((s, d) => anomalyHours(s, d)),
    "q_changepoint" -> ((s, d) => changepoint(s, d)),
    "q_sessionize" -> ((s, d) => sessionize(s, d)),
    "q_event_funnel" -> ((s, d) => eventFunnel(s, d)),
    "q_retention" -> ((s, d) => retention(s, d)),
    "q_join_bucketed" -> ((s, d) => joinBucketed(s, d)),
    "q_time_decay" -> ((s, d) => timeDecay(s, d)),
    "q_zorder" -> ((s, d) => zorderLayout(s, d)),
    "q_compaction" -> ((s, d) => compactionPlan(s, d)),
  )

  // DuckDB parity notes: money math uses the same DECIMAL casts so
  // sums are exact on both engines; all double outputs rounded after
  // exact aggregation; every ORDER BY carries a unique tiebreak.
  private val revExpr =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  // COALESCE mirrors the Spark side's empty-cell coalesce: a cell
  // with no orders is 0 in BOTH engines (sum(CASE...) alone would be
  // NULL here while count(CASE...) is already 0).
  private def pivotCell(st: String): String =
    s"""       count(CASE WHEN o_orderstatus = '$st' THEN 1 END)
       |         AS "${st}_cnt",
       |       CAST(COALESCE(sum(CASE WHEN o_orderstatus = '$st'
       |                THEN CAST(round(o_totalprice * 100) AS BIGINT) END),
       |            0) AS BIGINT) AS "${st}_cents"""".stripMargin

  /** DuckDB form of [[zExpr]] — same shift/mask/add arithmetic. */
  private def zExprSql(a: String, b: String): String =
    (0 until 8).map(i =>
      s"((($a >> $i) & 1) << ${2 * i + 1}) + ((($b >> $i) & 1) << ${2 * i})")
      .mkString(" + ")

  val oracles: Map[String, String] = Map(
    "q_compaction" ->
      s"""WITH f AS (SELECT source, doc_id,
         |                  CAST(length(text) AS BIGINT) AS bytes
         |           FROM documents),
         |c AS (SELECT source, doc_id, bytes,
         |             CAST(sum(bytes) OVER (PARTITION BY source
         |               ORDER BY doc_id
         |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |      FROM f)
         |SELECT source, (cum - bytes) // $CompactTarget AS bin,
         |       count(*) AS n_files,
         |       CAST(sum(bytes) AS BIGINT) AS tot_bytes,
         |       min(doc_id) AS first_file, max(doc_id) AS last_file,
         |       CAST(1000000 * sum(bytes) // $CompactTarget AS BIGINT)
         |         AS fill_ppm
         |FROM c GROUP BY 1, 2 ORDER BY 1 ASC, 2 ASC""".stripMargin,
    "q_table_stats" -> {
      // One UNION arm per profiled column — the same stats the one
      // Expand-pass computes; sums are HUGEINT in DuckDB, cast back.
      val arms = StatsCols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |       count(*) - count($c) AS n_null,
           |       count(DISTINCT $c) AS ndv,
           |       CAST(min($c) AS VARCHAR) AS min_v,
           |       CAST(max($c) AS VARCHAR) AS max_v,
           |       CAST(1000000 * sum(length(CAST($c AS VARCHAR)))
           |            // count($c) AS BIGINT) AS avg_len_micro
           |FROM lineitem""".stripMargin
      }
      arms.mkString("\nUNION ALL\n") + "\nORDER BY col_name ASC"
    },
    "q_zorder" ->
      s"""WITH e AS (SELECT user_id,
         |                  CAST(round(value * 100) AS BIGINT) AS vc
         |           FROM events),
         |r AS (SELECT min(user_id) AS mnu, max(user_id) AS mxu,
         |             min(vc) AS mnv, max(vc) AS mxv FROM e),
         |b AS (SELECT user_id, vc,
         |             CAST((user_id - mnu) * 256 // (mxu - mnu + 1) AS INT)
         |               AS a8,
         |             CAST((vc - mnv) * 256 // (mxv - mnv + 1) AS INT) AS b8
         |      FROM e, r),
         |z AS (SELECT user_id, vc,
         |             CAST((${zExprSql("a8", "b8")}) // 256 AS BIGINT)
         |               AS file_id
         |      FROM b)
         |SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
         |       min(user_id) AS min_u, max(user_id) AS max_u,
         |       min(vc) AS min_vc, max(vc) AS max_vc
         |FROM z GROUP BY file_id ORDER BY file_id ASC""".stripMargin,
    "q_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |         AS BIGINT) AS cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment ASC""".stripMargin,
    "q_skew_audit" ->
      """WITH c AS (SELECT o_custkey AS key, count(*) AS cnt
        |           FROM orders GROUP BY o_custkey),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot,
        |             count(*) AS nk FROM c),
        |top AS (SELECT key, cnt FROM c
        |        ORDER BY cnt DESC, key ASC LIMIT 10)
        |SELECT key, CAST(cnt AS BIGINT) AS cnt,
        |       CAST((2 * 1000000 * cnt + tot) // (2 * tot) AS BIGINT)
        |         AS share_ppm,
        |       CAST((2 * 1000 * cnt * nk + tot) // (2 * tot) AS BIGINT)
        |         AS x_mean_milli
        |FROM top, t ORDER BY cnt DESC, key ASC""".stripMargin,
    "q_pivot" ->
      s"""SELECT o_orderpriority,
         |${PivotStatuses.map(pivotCell).mkString(",\n")}
         |FROM orders GROUP BY o_orderpriority
         |ORDER BY o_orderpriority ASC""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag, count(*) AS n,
        |       quantile_cont(l_quantity, 0.25) AS p25,
        |       quantile_cont(l_quantity, 0.5) AS p50,
        |       quantile_cont(l_quantity, 0.75) AS p75
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC""".stripMargin,
    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         lag(epoch_us(ts), 1) OVER
        |           (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |           AS prev_us
        |  FROM events),
        |f AS (
        |  SELECT user_id, us,
        |         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM e),
        |g AS (
        |  SELECT user_id, us,
        |         CAST(sum(is_new) OVER
        |           (PARTITION BY user_id ORDER BY us ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS sess
        |  FROM f)
        |SELECT user_id, min(us) AS start_us, max(us) AS last_us,
        |       count(*) AS n_events
        |FROM g GROUP BY user_id, sess
        |ORDER BY user_id ASC, start_us ASC""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |         AS BIGINT) AS sum_k,
        |       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |         AS BIGINT) AS min_k,
        |       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |         AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type ASC""".stripMargin,
    "q_window_range" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 1e6) AS BIGINT) AS v6
        |  FROM events)
        |SELECT user_id, event_id, us,
        |       count(*) OVER w AS n_1h,
        |       round(CAST(CAST(sum(v6) OVER w AS BIGINT) AS DOUBLE) / 1e6, 6)
        |         AS sv_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id ASC""".stripMargin,
    "q_set_ops" ->
      """WITH c AS (SELECT user_id FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id FROM events WHERE event_type = 'purchase')
        |SELECT 'both' AS cohort, count(*) AS n_users
        |  FROM (SELECT * FROM c INTERSECT SELECT * FROM p)
        |UNION ALL
        |SELECT 'click_only', count(*)
        |  FROM (SELECT * FROM c EXCEPT SELECT * FROM p)
        |UNION ALL
        |SELECT 'purchase_only', count(*)
        |  FROM (SELECT * FROM p EXCEPT SELECT * FROM c)
        |ORDER BY cohort ASC""".stripMargin,
    "q_string_agg" ->
      """SELECT user_id, count(*) AS n,
        |       string_agg(event_type, ',' ORDER BY epoch_us(ts), event_id)
        |         AS journey
        |FROM events GROUP BY user_id ORDER BY user_id ASC""".stripMargin,
    "q1_pricing" ->
      """WITH l AS (
        |  SELECT l_returnflag, l_linestatus,
        |         CAST(l_quantity AS DECIMAL(12,2)) AS q,
        |         CAST(l_extendedprice AS DECIMAL(12,2)) AS p,
        |         CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS dp,
        |         CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) *
        |           (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))) AS ch
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00')
        |SELECT l_returnflag, l_linestatus,
        |       round(CAST(sum(q) AS DOUBLE), 2) AS sum_qty,
        |       round(CAST(sum(p) AS DOUBLE), 2) AS sum_base_price,
        |       round(CAST(sum(dp) AS DOUBLE), 2) AS sum_disc_price,
        |       round(CAST(sum(ch) AS DOUBLE), 2) AS sum_charge,
        |       round(CAST(sum(q) AS DOUBLE) / count(*), 6) AS avg_qty,
        |       round(CAST(sum(p) AS DOUBLE) / count(*), 6) AS avg_price,
        |       count(*) AS count_order
        |FROM l GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag ASC, l_linestatus ASC""".stripMargin,
    "q_join_agg" ->
      s"""SELECT r_name, n_name,
         |       round(CAST(sum($revExpr) AS DOUBLE), 2) AS revenue,
         |       count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name ASC, n_name ASC""".stripMargin,
    "q_top_n_group" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders)
        |SELECT o_orderpriority, o_orderkey,
        |       round(o_totalprice, 2) AS o_totalprice, rnk
        |FROM r WHERE rnk <= 3
        |ORDER BY o_orderpriority ASC, rnk ASC""".stripMargin,
    "q_top_n_window" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders)
        |SELECT o_orderpriority, o_orderkey,
        |       round(o_totalprice, 2) AS o_totalprice,
        |       CAST(rnk AS INT) AS rnk
        |FROM r WHERE rnk <= 3
        |ORDER BY o_orderpriority ASC, rnk ASC""".stripMargin,
    "q_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |       round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2)
        |         AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |       count(*) AS n_items,
         |       CAST(round(sum($revExpr) * 100) AS BIGINT) AS revenue_cents
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
         |ORDER BY gid ASC, l_returnflag ASC NULLS LAST,
         |         l_linestatus ASC NULLS LAST""".stripMargin,
    "q_cube" ->
      """SELECT c_mktsegment, o_orderpriority, count(*) AS n_orders,
        |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE),
        |             2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE(c_mktsegment, o_orderpriority)
        |ORDER BY c_mktsegment ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_window_running" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |         CAST(round(value * 1e6) AS BIGINT) AS v6,
        |         epoch_us(ts) AS us
        |  FROM events WHERE user_id < 20)
        |SELECT user_id, event_id,
        |       round(CAST(sum(v6) OVER w AS DOUBLE) / 1e6, 6) AS running_value,
        |       us - lag(us, 1) OVER w AS gap_us
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id ASC, event_id ASC""".stripMargin,
    "q_semi_anti" ->
      """WITH u AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderpriority = '1-URGENT'),
        |s_semi AS (
        |  SELECT 'has_urgent' AS tag, c_mktsegment, count(*) AS n_cust,
        |         round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2)
        |           AS sum_bal
        |  FROM customer WHERE c_custkey IN (SELECT o_custkey FROM u)
        |  GROUP BY c_mktsegment),
        |s_anti AS (
        |  SELECT 'no_urgent' AS tag, c_mktsegment, count(*) AS n_cust,
        |         round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2)
        |           AS sum_bal
        |  FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM u)
        |  GROUP BY c_mktsegment)
        |SELECT * FROM s_semi UNION ALL SELECT * FROM s_anti
        |ORDER BY tag ASC, c_mktsegment ASC""".stripMargin,
    "q_anomaly" ->
      """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS bucket,
        |                  CAST(count(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(c) AS BIGINT) AS s,
        |              CAST(sum(c * c) AS BIGINT) AS ss
        |       FROM b GROUP BY 1)
        |SELECT event_type, bucket, c AS n_events
        |FROM b JOIN st USING (event_type)
        |WHERE c * n > s
        |  AND (c::HUGEINT * n - s) * (c::HUGEINT * n - s)
        |      > 9 * (n::HUGEINT * ss - s::HUGEINT * s)
        |ORDER BY bucket ASC, event_type ASC""".stripMargin,
    "q_changepoint" ->
      """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS bucket,
        |                  CAST(count(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, bucket, c,
        |             CAST(row_number() OVER tw AS BIGINT) AS k,
        |             CAST(sum(c) OVER tw AS BIGINT) AS s1,
        |             CAST(count(*) OVER pw AS BIGINT) AS m,
        |             CAST(sum(c) OVER pw AS BIGINT) AS s
        |      FROM b
        |      WINDOW tw AS (PARTITION BY event_type ORDER BY bucket ASC
        |                    ROWS BETWEEN UNBOUNDED PRECEDING
        |                    AND CURRENT ROW),
        |             pw AS (PARTITION BY event_type)),
        |sc AS (SELECT event_type, bucket, k, m - k AS n2, s1, s - s1 AS s2,
        |              CAST(abs(s1::HUGEINT * (m - k) -
        |                       (s - s1)::HUGEINT * k) * 1000000
        |                   // (k::HUGEINT * (m - k)) AS BIGINT)
        |                AS gap_micro
        |       FROM p WHERE k < m),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |              ORDER BY gap_micro DESC, bucket ASC) AS rn
        |      FROM sc)
        |SELECT event_type, bucket AS split_bucket, k AS n_before,
        |       n2 AS n_after,
        |       CAST(s1::HUGEINT * 1000000 // k AS BIGINT)
        |         AS mean_before_micro,
        |       CAST(s2::HUGEINT * 1000000 // n2 AS BIGINT)
        |         AS mean_after_micro,
        |       gap_micro
        |FROM r WHERE rn = 1 ORDER BY event_type ASC""".stripMargin,
    "q_events_bucket" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
        |       count(*) AS n,
        |       round(CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS DOUBLE)
        |             / 1e6, 6) AS sum_value
        |FROM events GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY bucket ASC, event_type ASC""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         lag(epoch_us(ts), 1) OVER
        |           (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_us
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, us,
        |         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM e),
        |g AS (
        |  SELECT user_id, event_id, us,
        |         CAST(sum(is_new) OVER
        |           (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           AS sess_idx
        |  FROM f)
        |SELECT user_id, sess_idx, count(*) AS n_events,
        |       min(us) AS start_us, max(us) - min(us) AS dur_us
        |FROM g GROUP BY user_id, sess_idx
        |ORDER BY user_id ASC, sess_idx ASC""".stripMargin,
    "q_event_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |t1 AS (SELECT user_id, min(us) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN t1 USING (user_id)
        |       WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN t2 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id),
        |c AS (SELECT '1_view' AS step, count(*) AS n FROM t1
        |      UNION ALL SELECT '2_click', count(*) FROM t2
        |      UNION ALL SELECT '3_purchase', count(*) FROM t3),
        |d AS (SELECT greatest(n, 1) AS n1 FROM c WHERE step = '1_view')
        |SELECT step, n AS n_users,
        |       CAST((2 * 1000000 * n + n1) // (2 * n1) AS BIGINT) AS conv_ppm
        |FROM c, d ORDER BY step ASC""".stripMargin,
    "q_retention" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |                    epoch_us(ts) // 604800000000 AS wk
        |             FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY user_id),
        |cells AS (SELECT cohort_wk, wk - cohort_wk AS wk_offset,
        |                 count(*) AS n_users
        |          FROM act JOIN f USING (user_id)
        |          GROUP BY cohort_wk, wk - cohort_wk),
        |sz AS (SELECT cohort_wk, n_users AS n0 FROM cells WHERE wk_offset = 0)
        |SELECT cohort_wk, wk_offset, n_users,
        |       CAST((2 * 1000000 * n_users + n0) // (2 * n0) AS BIGINT)
        |         AS retained_ppm
        |FROM cells JOIN sz USING (cohort_wk)
        |ORDER BY cohort_wk ASC, wk_offset ASC""".stripMargin,
    "q_join_bucketed" ->
      s"""SELECT o_orderkey, count(*) AS n_items,
         |       CAST(round(sum($revExpr) * 100) AS BIGINT) AS revenue_cents
         |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY o_orderkey ORDER BY o_orderkey ASC""".stripMargin,
    "q_time_decay" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us,
        |                  CAST(round(value * 1e6) AS BIGINT) AS m
        |           FROM events),
        |r AS (SELECT max(us) AS ref FROM e),
        |w AS (SELECT event_type, m,
        |             1000000 >> CAST(least((ref - us) // 604800000000, 62)
        |                             AS INTEGER) AS w
        |      FROM e, r)
        |SELECT event_type, count(*) AS n_events,
        |       CAST(sum(w) AS BIGINT) AS sum_w_ppm,
        |       CAST(sum(m::HUGEINT * w) // 1000000 AS BIGINT)
        |         AS decayed_value_micro
        |FROM w GROUP BY event_type ORDER BY event_type ASC""".stripMargin,
  )
}
