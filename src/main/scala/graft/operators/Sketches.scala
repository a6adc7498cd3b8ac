package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.MinHash

/** Sketch-based approximate query processing — the primitives that
  * make 100 TB interactive: a HyperLogLog distinct-count sketch, a
  * count-min frequency sketch, and a Bloom-filter membership
  * prefilter. The reference answers "how many distinct cards / how
  * often does a term occur / is this id in the set" with exact scans
  * over 30k rows (db/query_example.py:142-171 statistics,
  * db/init.sql index lookups); at 100 TB those questions are answered
  * with fixed-size sketches that merge associatively across
  * partitions — a map-side-combinable aggregation whose shuffled
  * state is O(sketch), not O(data).
  *
  * Everything here is DETERMINISTIC (md5-derived hashes shared with
  * the DuckDB oracles, no library RNG) so the correctness gate can
  * hash-compare the sketch outputs bit-for-bit — the estimator
  * arithmetic is arranged to stay exact (integer register math,
  * dyadic fractions, one final correctly-rounded division) rather
  * than relying on cross-engine libm agreement.
  *
  * Scale design:
  *  - HLL: per (group, bucket) max-rho is a map-side-combining agg on
  *    group×256 keys; registers merge with max() so the same plan
  *    serves shards, partitions, or days-of-data. The exact distinct
  *    column exists only to exhibit the sketch's error and would be
  *    dropped at scale.
  *  - CMS: the sketch build aggregates token counts into d×w = 4096
  *    cells — map-side combine absorbs token skew ("the" never
  *    funnels one reducer: it is ONE cell per row). Probes join the
  *    tiny cell table broadcast.
  *  - Bloom: the bit set (m=4096 positions) is a sub-kilobyte
  *    broadcast; the probe side tests membership map-only — the
  *    distributed form of the runtime bloom-join pruning modern
  *    engines plan automatically.
  */
object Sketches extends graft.QueryGroup {

  // ---------------------------------------------------------------
  // HyperLogLog: m = 256 registers, 16-bit rank window.
  // h = md5-derived 60-bit hash; bucket = h mod 256; the rank rho =
  // leading-zero count of the next 16 bits + 1 ∈ [1, 17], computed
  // exactly via the minimal-width binary rendering (length(bin(v)) =
  // floor(log2 v)+1 with no float log anywhere).
  // Estimator: alpha_256 · m² / Σ 2^(-M_j) with the denominator kept
  // in INTEGER fixed point (Σ 2^(17-M_j), empty registers contribute
  // 2^17) so the only float op is one final division by a constant —
  // identical to the last bit across engines.
  // ---------------------------------------------------------------

  private[graft] val HllM = 256
  private[graft] val HllWindow = 16
  /** alpha_256 · m² · 2^17 (the fixed-point scale), one literal shared
    * verbatim with the oracle: 0.7213/(1+1.079/256) · 65536 · 131072. */
  private[graft] val HllNum = "6169914595.23982"

  private[graft] def hllRho(r16: Column): Column =
    when(r16 === 0, lit(HllWindow + 1))
      .otherwise(lit(HllWindow + 1) - length(bin(r16)))

  /** (group, bucket, rho-max, per-bucket exact distinct) registers
    * for a keyed input — the MERGEABLE sketch state: registers from
    * disjoint shards combine with max(m) / sum(nd) to exactly the
    * whole-corpus registers (asserted in SketchesSpec). */
  private[graft] def hllRegisters(in: DataFrame, group: Column,
      key: Column): DataFrame = {
    val h = MinHash.hash60(concat(lit("hll:"), key.cast("string")))
    in.select(group.as("g"),
        pmod(h, lit(HllM.toLong)).as("bucket"),
        hllRho(shiftright(h, 8).bitwiseAND(lit(0xffffL))).as("rho"),
        key.as("k"))
      .groupBy(col("g"), col("bucket"))
      .agg(max(col("rho")).as("m"), countDistinct(col("k")).as("nd"))
  }

  /** Fold a bare (group, bucket, m) register table into an
    * integer-rounded NDV estimate per group — the serve-side fold
    * for register tables maintained WITHOUT the exact-audit column
    * (q_stream_stats' unbounded-key arm). Same fixed-point
    * denominator as [[hllEstimate]]; the only float op is the final
    * constant division, so the rounded estimate is bit-identical
    * across engines. */
  private[graft] def hllNdv(regs: DataFrame, group: String): DataFrame =
    regs.groupBy(col(group))
      .agg((sum(expr(s"shiftleft(1L, ${HllWindow + 1} - m)")) +
        (lit(HllM.toLong) - count(lit(1))) * lit(1L << (HllWindow + 1)))
        .as("denom_fp"))
      .select(col(group),
        round(lit(HllNum).cast("double") / col("denom_fp").cast("double"))
          .cast("long").as("ndv"))

  /** Fold registers into (g, n_exact, regs_hit, est). */
  private[graft] def hllEstimate(regs: DataFrame): DataFrame =
    regs.groupBy(col("g"))
      .agg(sum(col("nd")).as("n_exact"),
        count(lit(1)).as("regs_hit"),
        (sum(expr(s"shiftleft(1L, ${HllWindow + 1} - m)")) +
          (lit(HllM.toLong) - count(lit(1))) * lit(1L << (HllWindow + 1)))
          .as("denom_fp"))
      .select(col("g"), col("n_exact"), col("regs_hit"),
        round(lit(HllNum).cast("double") / col("denom_fp").cast("double"), 3)
          .as("est"))

  /** Distinct `l_orderkey` per returnflag: exact vs HLL-256 estimate.
    * One shuffle on (flag, bucket) — bucket partitions the key space,
    * so per-bucket exact distincts sum to the global distinct and the
    * register max-rank rides the same aggregation. */
  def hllDistinct(s: SparkSession, dir: String): DataFrame =
    hllEstimate(hllRegisters(Tables.lineitem(s, dir),
      col("l_returnflag"), col("l_orderkey")))
      .withColumnRenamed("g", "l_returnflag")
      .orderBy(col("l_returnflag").asc)

  // ---------------------------------------------------------------
  // Count-min sketch: d = 4 hash rows × w = 1024 columns over the
  // corpus token stream; estimate(t) = min_j cell(j, h_j(t)).
  // ---------------------------------------------------------------

  private val CmsD = 4
  private val CmsW = 1024L
  /** Probe terms: three frequent, one mid, one absent — the absent
    * probe exhibits the collision overcount CMS is allowed to make
    * (estimate ≥ truth, never under). */
  private val CmsProbes = Seq("table", "query", "spark", "merge", "zebra")

  private def cmsPos(j: Int, tok: Column): Column =
    pmod(MinHash.hash60(concat(lit(s"cms$j:"), tok)), lit(CmsW))

  /** Token-frequency estimates from the 4×1024 sketch next to true
    * counts for the fixed probe set. */
  def cmsFreq(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
    val cells = toks
      .select(explode(array((0 until CmsD).map(j =>
        struct(lit(j).as("j"), cmsPos(j, col("tok")).as("pos"))): _*)).as("c"))
      .select(col("c.j").as("j"), col("c.pos").as("pos"))
      .groupBy(col("j"), col("pos")).agg(count(lit(1)).as("cnt"))
    val probes = s.range(1).select(
        explode(array(CmsProbes.map(lit): _*)).as("token"))
      .select(col("token"), explode(array((0 until CmsD).map(j =>
        struct(lit(j).as("j"), cmsPos(j, col("token")).as("pos"))): _*)).as("c"))
      .select(col("token"), col("c.j").as("j"), col("c.pos").as("pos"))
    val est = probes
      .join(cells, Seq("j", "pos"), "left")
      .groupBy(col("token"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
    val truth = toks.groupBy(col("tok")).agg(count(lit(1)).as("true_cnt"))
    est.join(truth, est("token") === truth("tok"), "left")
      .select(col("token"), coalesce(col("true_cnt"), lit(0L)).as("true_cnt"),
        col("cms_est"))
      .orderBy(col("token").asc)
  }

  // ---------------------------------------------------------------
  // Bloom-filter semi-join prefilter: m = 4096 bits, k = 3 hashes.
  // Build over the urgent orders' keys; probe every lineitem key.
  // ---------------------------------------------------------------

  private val BloomM = 4096L
  private[operators] val BloomK = 3

  /** Position j of `key` in the m-bit Bloom space (shared with the
    * contamination scan's pre-join prune, Curation.scala). */
  private[operators] def bloomPos(j: Int, key: Column): Column =
    pmod(MinHash.hash60(concat(lit(s"bf$j:"), key.cast("string"))),
      lit(BloomM))

  private def bloomPositions(key: Column): Column =
    explode(array((0 until BloomK).map(j => bloomPos(j, key)): _*))

  /** Bloom prefilter audit: keys/rows passing the filter vs the exact
    * semi-join, with the false-positive count (false NEGATIVES are
    * impossible — asserted in SketchesSpec). */
  def bloomSemi(s: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(s, dir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bits = urgent.select(bloomPositions(col("o_orderkey")).as("pos"))
      .distinct()
    val rowsPerKey = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_rows"))
    val probed = rowsPerKey
      .select(col("l_orderkey"), col("n_rows"),
        bloomPositions(col("l_orderkey")).as("pos"))
      .join(broadcast(bits.withColumn("hit", lit(1))), Seq("pos"), "left")
      .groupBy(col("l_orderkey"), col("n_rows"))
      .agg((sum(coalesce(col("hit"), lit(0))) === BloomK).as("pass"))
    val withTruth = probed.join(
      urgent.withColumn("member", lit(true)),
      probed("l_orderkey") === urgent("o_orderkey"), "left")
      .select(col("l_orderkey"), col("n_rows"), col("pass"),
        coalesce(col("member"), lit(false)).as("member"))
    withTruth.agg(
        count(lit(1)).as("n_keys"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("keys_pass"),
        sum(when(col("member"), 1L).otherwise(0L)).as("keys_true"),
        sum(when(col("pass") && !col("member"), 1L).otherwise(0L))
          .as("keys_fp"),
        sum(col("n_rows")).as("n_rows"),
        sum(when(col("pass"), col("n_rows")).otherwise(0L)).as("rows_pass"),
        sum(when(col("member"), col("n_rows")).otherwise(0L)).as("rows_true"))
  }

  // ---------------------------------------------------------------
  // HDR-histogram quantile sketch: log2 octave × 32 linear
  // sub-buckets. The MERGEABLE quantile path q_percentile's doc
  // promises for unbounded measures: bucket(v) = 32·⌊log2 v⌋ +
  // ⌊(v−2^m)·32 / 2^m⌋ — ALL integer arithmetic (the octave via the
  // minimal-width bin() rendering, the sub-bucket via shifts), so
  // the sketch is hash-exact cross-engine, and counts merge by
  // addition (proven in SketchesSpec). Relative error ≤ 1/32 ≈ 3%
  // by construction. State: ≤ ~26 octaves × 32 cells per group.
  // ---------------------------------------------------------------

  private val HdrSub = 32
  private val HdrQs = Seq(0.5, 0.9, 0.99)

  /** Quantile estimates (p50/p90/p99) of order value in cents per
    * priority from the HDR bucket counts, AUDITED against the corpus:
    * `frac` is the realized rank of each estimate (count(v ≤ est)/n,
    * a map-side conditional count against 15 broadcast thresholds —
    * not a sort). Guarantees: VALUE relative error ≤ 1/HdrSub by
    * construction (bucket width is 2^m/HdrSub inside octave m); the
    * RANK deviation |frac − q| is bounded by the mass fraction of
    * the bucket the quantile lands in (≈ a few % on smooth data —
    * SketchesSpec asserts the data-derived bound, not a constant).
    *
    * Scale: the sketch build is one map-side-combining agg onto
    * (group, bucket) keys — bounded cells, no skew; the cumulative
    * walk and quantile pick run on the CELLS (≤ ~832/group), not the
    * rows; the audit pass is map-only + small-key agg. Sharded
    * corpora build cells per shard and merge by summing counts —
    * the same plan at any scale. */
  def hdrQuantile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val o = Tables.orders(s, dir).select(
      col("o_orderpriority").as("prio"),
      round(col("o_totalprice") * 100).cast("long").as("v"))
    val cells = hdrCells(o)
    val w = Window.partitionBy("prio")
    val cum = cells
      .withColumn("cum", sum(col("cnt")).over(w.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(w))
    val est = cum.crossJoin(broadcast(HdrQs.toDF("q")))
      .where(col("cum") >= ceil(col("q") * col("n")))
      .groupBy(col("prio"), col("q"))
      .agg(min(col("bucket")).as("qb"), max(col("n")).as("n"))
      .select(col("prio"), col("q"), col("n"), expr(
        s"""CAST(shiftleft(CAST(1 AS BIGINT), CAST(qb DIV $HdrSub AS INT))
           | AS DOUBLE) * (1.0D + (CAST(qb % $HdrSub AS DOUBLE) + 0.5D)
           | / $HdrSub.0D)""".stripMargin.replace("\n", ""))
        .as("est"))
    o.join(broadcast(est), Seq("prio"))
      .groupBy(col("prio"), col("q"))
      .agg(max(col("n")).as("n"), max(col("est")).as("est0"),
        sum(when(col("v").cast("double") <= col("est"), 1L).otherwise(0L))
          .as("le"))
      .select(col("prio"), col("q"), col("n"),
        round(col("est0"), 4).as("est"),
        round(col("le").cast("double") / col("n"), 6).as("frac"))
      .orderBy(col("prio").asc, col("q").asc)
  }

  /** The (prio, bucket, cnt) HDR cell build alone — the mergeable
    * sketch state, exposed for the merge-equivalence spec. */
  private[graft] def hdrCells(o: DataFrame): DataFrame =
    o.select(col("prio"), (length(bin(col("v"))) - 1).as("m"), col("v"))
      .select(col("prio"),
        (col("m") * HdrSub + expr(
          s"shiftright((v - shiftleft(CAST(1 AS BIGINT), m)) * $HdrSub, m)"))
          .as("bucket"))
      .groupBy(col("prio"), col("bucket")).agg(count(lit(1)).as("cnt"))

  // ---------------------------------------------------------------
  // Theta/KMV set-operation sketch: fixed sampling threshold
  // θ = 2^60 / ThetaRate over the 60-bit key hash. A key is IN the
  // sketch iff h(key) < θ — a map-only membership rule, so sketches
  // of A, B, A∩B, A∪B are all derivable from the SAME per-key bit,
  // and set-operation estimates are |sample| · ThetaRate. This is
  // the fixed-threshold mode of the Apache-DataSketches theta
  // family: intersection/union/Jaccard across segments — the
  // audience-overlap question HLL cannot answer (HLL unions but
  // never intersects).
  // Fixed-RATE is the gate-determinism choice (the q_dedup_recall
  // precedent): a deployment bounds sketch MEMORY instead by keeping
  // the K smallest hashes (adaptive θ = k-th min) via a bounded
  // min-heap aggregate — same estimator, same joins.
  // ---------------------------------------------------------------

  private[graft] val ThetaRate = 8L
  private val ThetaCut = (1L << 60) / ThetaRate

  /** q_theta_sketch — audience overlap across event types: for every
    * type pair, exact distinct-user intersection/union next to the
    * theta-sketch estimates and the sketch Jaccard in ppm. Shape:
    * ONE distinct on (type, user) + the per-user type pair self-join
    * (≤ C(|types|,2) rows per user — linear), map-side-combined
    * counting aggs; the sketch bit rides the same rows, so the whole
    * row costs one extra comparison over the exact audit it grades
    * itself against (at 100 TB the exact columns are dropped and
    * ONLY the θ-filtered sample crosses the wire — corpus × 1/rate
    * rows, map-filtered at the scan). */
  def thetaSketch(s: SparkSession, dir: String): DataFrame =
    thetaSketchOver(Tables.events(s, dir)
      .select(col("event_type").as("t"), col("user_id").as("u")))

  /** [[thetaSketch]] over ANY (t, u) membership relation —
    * the scale-smoke injection point. */
  private[graft] def thetaSketchOver(in: DataFrame): DataFrame = {
    val ut = in.select(col("t"), col("u"))
      .distinct()
      .withColumn("smp",
        (MinHash.hash60(concat(lit("tsk:"), col("u").cast("string"))) <
          ThetaCut).cast("long"))
      .transform(graft.Checkpoints.cut)
    val per = ut.groupBy(col("t"))
      .agg(count(lit(1)).as("n"), sum(col("smp")).as("sm"))
    val pair = ut.select(col("t").as("ta"), col("u"), col("smp"))
      .join(ut.select(col("t").as("tb"), col("u")), Seq("u"))
      .where(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("inter_exact"), sum(col("smp")).as("ism"))
    pair
      .join(broadcast(per.select(col("t").as("ta"), col("n").as("na"),
        col("sm").as("sa"))), Seq("ta"))
      .join(broadcast(per.select(col("t").as("tb"), col("n").as("nb"),
        col("sm").as("sb"))), Seq("tb"))
      .select(col("ta"), col("tb"), col("na"), col("nb"),
        col("inter_exact"),
        (col("na") + col("nb") - col("inter_exact")).as("union_exact"),
        (col("ism") * ThetaRate).as("inter_est"),
        ((col("sa") + col("sb") - col("ism")) * ThetaRate).as("union_est"),
        expr(s"""CAST(ism * 1000000 DIV
                 greatest(sa + sb - ism, 1L) AS BIGINT)""")
          .as("jaccard_est_ppm"))
      .orderBy(col("ta").asc, col("tb").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_theta_sketch" -> ((s, d) => thetaSketch(s, d)),
    "q_hll_distinct" -> ((s, d) => hllDistinct(s, d)),
    "q_cms_freq" -> ((s, d) => cmsFreq(s, d)),
    "q_bloom_semi" -> ((s, d) => bloomSemi(s, d)),
    "q_hdr_quantile" -> ((s, d) => hdrQuantile(s, d)),
  )

  private def h60(e: String): String = MinHash.hash60Sql(e)

  val oracles: Map[String, String] = Map(
    "q_theta_sketch" -> {
      val h = h60("'tsk:' || CAST(u AS VARCHAR)")
      s"""WITH ut AS (SELECT DISTINCT event_type AS t, user_id AS u
         |            FROM events),
         |us AS (SELECT t, u,
         |              CASE WHEN $h < ${(1L << 60) / ThetaRate}
         |                   THEN 1 ELSE 0 END AS smp
         |       FROM ut),
         |per AS (SELECT t, CAST(count(*) AS BIGINT) AS n,
         |               CAST(sum(smp) AS BIGINT) AS sm
         |        FROM us GROUP BY t),
         |pr AS (SELECT a.t AS ta, b.t AS tb,
         |              CAST(count(*) AS BIGINT) AS inter_exact,
         |              CAST(sum(a.smp) AS BIGINT) AS ism
         |       FROM us a JOIN us b ON a.u = b.u AND a.t < b.t
         |       GROUP BY a.t, b.t)
         |SELECT ta, tb, pa.n AS na, pb.n AS nb, inter_exact,
         |       pa.n + pb.n - inter_exact AS union_exact,
         |       ism * $ThetaRate AS inter_est,
         |       (pa.sm + pb.sm - ism) * $ThetaRate AS union_est,
         |       CAST(ism * 1000000 //
         |            greatest(pa.sm + pb.sm - ism, 1) AS BIGINT)
         |         AS jaccard_est_ppm
         |FROM pr JOIN per pa ON pr.ta = pa.t
         |        JOIN per pb ON pr.tb = pb.t
         |ORDER BY ta ASC, tb ASC""".stripMargin
    },
    "q_hdr_quantile" ->
      s"""WITH o AS (SELECT o_orderpriority AS prio,
         |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
         |           FROM orders),
         |bk AS (SELECT prio,
         |              (length(bin(v)) - 1) * $HdrSub +
         |              (((v - (CAST(1 AS BIGINT) << (length(bin(v)) - 1)))
         |                * $HdrSub) >> (length(bin(v)) - 1)) AS bucket
         |       FROM o),
         |cells AS (SELECT prio, bucket, count(*) AS cnt FROM bk
         |          GROUP BY prio, bucket),
         |c AS (SELECT prio, bucket,
         |             CAST(sum(cnt) OVER (PARTITION BY prio ORDER BY bucket
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |               AS BIGINT) AS cum,
         |             CAST(sum(cnt) OVER (PARTITION BY prio) AS BIGINT) AS n
         |      FROM cells),
         |qs AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE])
         |         AS q),
         |picked AS (SELECT prio, q, min(bucket) AS qb, max(n) AS n
         |           FROM c, qs WHERE cum >= ceil(q * n)
         |           GROUP BY prio, q),
         |est AS (SELECT prio, q, n,
         |               CAST((CAST(1 AS BIGINT) << (qb // $HdrSub)) AS DOUBLE)
         |                 * (1.0 + (CAST(qb % $HdrSub AS DOUBLE) + 0.5)
         |                    / $HdrSub.0) AS est
         |        FROM picked)
         |SELECT e.prio, e.q, e.n, round(e.est, 4) AS est,
         |       round(CAST(sum(CASE WHEN CAST(o.v AS DOUBLE) <= e.est
         |                          THEN 1 ELSE 0 END) AS DOUBLE) / e.n, 6)
         |         AS frac
         |FROM est e JOIN o ON o.prio = e.prio
         |GROUP BY e.prio, e.q, e.n, e.est
         |ORDER BY e.prio ASC, e.q ASC""".stripMargin,
    "q_hll_distinct" -> {
      val h = h60("'hll:' || CAST(l_orderkey AS VARCHAR)")
      s"""WITH b AS (
         |  SELECT l_returnflag,
         |         $h % $HllM AS bucket,
         |         ($h >> 8) & 65535 AS r16,
         |         l_orderkey
         |  FROM lineitem),
         |r AS (
         |  SELECT l_returnflag, bucket,
         |         max(CASE WHEN r16 = 0 THEN ${HllWindow + 1}
         |                  ELSE ${HllWindow + 1} - length(bin(r16)) END) AS m,
         |         count(DISTINCT l_orderkey) AS nd
         |  FROM b GROUP BY l_returnflag, bucket)
         |SELECT l_returnflag,
         |       CAST(sum(nd) AS BIGINT) AS n_exact,
         |       count(*) AS regs_hit,
         |       round($HllNum / CAST(
         |         CAST(sum(1::BIGINT << (${HllWindow + 1} - m)) AS BIGINT) +
         |         ($HllM - count(*)) * ${1L << (HllWindow + 1)}
         |         AS DOUBLE), 3) AS est
         |FROM r GROUP BY l_returnflag
         |ORDER BY l_returnflag ASC""".stripMargin
    },
    "q_cms_freq" -> {
      val cellUnion = (0 until CmsD).map(j =>
        s"SELECT $j AS j, ${h60(s"'cms$j:' || tok")} % $CmsW AS pos FROM toks")
        .mkString("\n    UNION ALL ")
      val probeList = CmsProbes.map(t => s"('$t')").mkString(", ")
      s"""WITH toks AS (
         |  SELECT unnest(str_split(text, ' ')) AS tok FROM documents),
         |cells AS (
         |  SELECT j, pos, count(*) AS cnt FROM (
         |    $cellUnion
         |  ) GROUP BY j, pos),
         |probes AS (
         |  SELECT token, j, ${h60("'cms' || CAST(j AS VARCHAR) || ':' || token")}
         |           % $CmsW AS pos
         |  FROM (VALUES $probeList) p(token),
         |       (SELECT unnest(generate_series(0, ${CmsD - 1})) AS j)),
         |est AS (
         |  SELECT token, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS cms_est
         |  FROM probes LEFT JOIN cells USING (j, pos) GROUP BY token),
         |truth AS (SELECT tok, count(*) AS true_cnt FROM toks GROUP BY tok)
         |SELECT token, CAST(coalesce(true_cnt, 0) AS BIGINT) AS true_cnt,
         |       cms_est
         |FROM est LEFT JOIN truth ON est.token = truth.tok
         |ORDER BY token ASC""".stripMargin
    },
    "q_bloom_semi" -> {
      def pos(j: Int, e: String) = s"${h60(s"'bf$j:' || $e")} % $BloomM"
      val buildPos = (0 until BloomK)
        .map(j => pos(j, "CAST(o_orderkey AS VARCHAR)")).mkString(", ")
      val probePos = (0 until BloomK)
        .map(j => pos(j, "CAST(l_orderkey AS VARCHAR)")).mkString(", ")
      s"""WITH urgent AS (
         |  SELECT o_orderkey FROM orders
         |  WHERE o_orderpriority = '1-URGENT'),
         |bits AS (
         |  SELECT DISTINCT unnest([$buildPos]) AS pos FROM urgent),
         |rk AS (
         |  SELECT l_orderkey, count(*) AS n_rows FROM lineitem
         |  GROUP BY l_orderkey),
         |pp AS (
         |  SELECT l_orderkey, n_rows, unnest([$probePos]) AS pos FROM rk),
         |probed AS (
         |  SELECT l_orderkey, n_rows,
         |         sum(CASE WHEN bits.pos IS NULL THEN 0 ELSE 1 END)
         |           = $BloomK AS pass
         |  FROM pp LEFT JOIN bits USING (pos)
         |  GROUP BY l_orderkey, n_rows),
         |t AS (
         |  SELECT p.l_orderkey, p.n_rows, p.pass,
         |         u.o_orderkey IS NOT NULL AS member
         |  FROM probed p LEFT JOIN urgent u ON p.l_orderkey = u.o_orderkey)
         |SELECT count(*) AS n_keys,
         |       CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
         |         AS keys_pass,
         |       CAST(sum(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT)
         |         AS keys_true,
         |       CAST(sum(CASE WHEN pass AND NOT member THEN 1 ELSE 0 END)
         |         AS BIGINT) AS keys_fp,
         |       CAST(sum(n_rows) AS BIGINT) AS n_rows,
         |       CAST(sum(CASE WHEN pass THEN n_rows ELSE 0 END) AS BIGINT)
         |         AS rows_pass,
         |       CAST(sum(CASE WHEN member THEN n_rows ELSE 0 END) AS BIGINT)
         |         AS rows_true
         |FROM t""".stripMargin
    },
  )
}
