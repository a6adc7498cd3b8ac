package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Lsh
import graft.functions.VectorFunctions._
import graft.plans.NearestCell

/** Approximate-nearest-neighbor scale path — what replaces the
  * reference's HNSW index (reference: db/init.sql:50-52) when the
  * corpus is 100 TB instead of 30k rows. Two index families:
  *
  *  - Random-hyperplane LSH ([[Lsh]]): map-only bucket code; a probe
  *    reads only the query's bucket ± 1-bit multiprobe neighbors —
  *    an equi-join on the bucket code, never a corpus scan.
  *  - IVF (inverted file): a deterministic coarse quantizer —
  *    md5-ordered sample → seeds → one Lloyd iteration (exact
  *    fixed-point centroid means) → cell assignment; a probe ranks
  *    only the nprobe nearest cells' members.
  *
  * Scale design (100 TB): both index builds are one-pass batch jobs
  * whose outputs (bucket/cell column) become the table's partition or
  * bucket key, so probes become partition-pruned reads. The probe
  * query side is always tiny and broadcast; candidate ranking uses
  * exact cosine on the pruned candidate set only. KMeans here is one
  * deterministic Lloyd step so the whole pipeline stays hash-exactly
  * DuckDB-checkable (an MLlib KMeans would drop this to a rows-only
  * check while exercising the identical plan shape — assignment is
  * the same broadcast-join + argmin either way).
  */
object Ann extends graft.QueryGroup {

  val Dim = 64
  val NumPlanes = 8 // 256 buckets
  val IvfCells = 16
  val NProbe = 2
  val PqM = 8 // product-quantization subspaces
  val PqSub = Dim / PqM // dims per subspace
  val PqK = 16 // codewords per subspace → 8 nibble codes, 16^8 cells

  private val planes = Lsh.planes(NumPlanes, Dim)

  /** 1-bit multiprobe: a query's own bucket plus every single-bit
    * neighbor — the ONE definition all probe sides share, including
    * the parametric operating-point audit (the SQL twin is
    * `probeXors`). */
  private def multiprobe(qb: org.apache.spark.sql.Column,
      n: Int = NumPlanes) =
    explode(array((lit(0) +: (0 until n).map(p => lit(1 << p)))
      .map(m => qb.bitwiseXOR(m)): _*))

  /** LSH-bucketed ANN search for query vec_id=0: bucket the corpus
    * (map-only), probe the query bucket plus all 1-bit neighbors
    * (multiprobe, recall guard), exact-cosine rank the candidates. */
  def lshBucketSearch(s: SparkSession, dir: String, id: Long = 0L,
      k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val corpus = e.where(col("vec_id") =!= id)
      .select(col("vec_id"), col("embedding"),
        Lsh.bucketCode(col("embedding"), planes).as("bucket"))
    val probes = e.where(col("vec_id") === id)
      .select(col("embedding").as("qvec"),
        Lsh.bucketCode(col("embedding"), planes).as("qb"))
      .select(col("qvec"), multiprobe(col("qb")).as("bucket"))
    corpus.join(broadcast(probes), Seq("bucket"))
      .select(col("vec_id"), col("bucket"),
        cosineSim(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), col("bucket"), round(col("sim"), 6).as("sim"))
  }

  /** ANN quality gate: recall@k of the LSH bucket search against the
    * exact brute-force top-k — the audit every approximate index
    * needs before it may replace the exact scan (the reference trusts
    * pgvector's HNSW blindly; at 100 TB you measure recall on a
    * sample and tune planes/probes until it clears the bar). Both
    * sides are deterministic, so the recall itself is a hash-exact
    * oracle row, not a flaky statistic. */
  def annRecall(s: SparkSession, dir: String, id: Long = 0L,
      k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.where(col("vec_id") === id).select(col("embedding").as("qvec"))
    val brute = e.where(col("vec_id") =!= id).crossJoin(broadcast(q))
      .select(col("vec_id"), cosineSim(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(k)
      .select(col("vec_id"))
    val approx = lshBucketSearch(s, dir, id, k)
      .select(col("vec_id"), lit(1).as("hit"))
    brute.join(broadcast(approx), Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_brute"),
        sum(coalesce(col("hit"), lit(0))).as("n_hits"))
      .select(lit(k.toLong).as("k"), col("n_brute"), col("n_hits"),
        round(col("n_hits").cast("double") / k, 6).as("recall"))
  }

  /** One broadcast array row of (cid, cvec) structs, sorted for
    * deterministic iteration (argmin itself is order-independent:
    * ties break to the smaller cid). */
  private[graft] def asArray(c: DataFrame): DataFrame =
    c.agg(sort_array(collect_list(struct(col("cid"), col("cvec"))))
      .as("cents"))

  /** The standing serving side of the STREAMING ANN twin
    * ([[graft.streaming.Streaming.streamAnn]]): the corpus' final
    * cell assignment plus the one-row centroid array, built by the
    * exact quantizer q_ann_ivf serves from — one definition, so the
    * streaming probe provably searches the same index. */
  private[graft] def ivfServingSide(e: DataFrame): (DataFrame, DataFrame) = {
    val centArr = asArray(ivfCentroidsOf(e, IvfCells))
    val a1 = e.crossJoin(broadcast(centArr))
      .select(col("vec_id"), col("embedding"),
        NearestCell(col("embedding"), col("cents")).as("cell"))
    (a1, centArr)
  }

  /** Map-only top-2 probe cells for a query vector against the
    * broadcast centroid array: nearest cell, then nearest among the
    * rest — identical to ranking all cells by (distance asc, cid
    * asc) and taking NProbe=2, but expressible per-row with no
    * aggregation, which is what a STREAM-side probe needs (the
    * batch probe's orderBy/limit would be a per-batch shuffle). */
  private[graft] def probeCellsTop2(qvec: Column, cents: Column): Column = {
    val c1 = NearestCell(qvec, cents)
    array(c1, NearestCell(qvec,
      filter(cents, c => !(c.getField("cid") === c1))))
  }

  /** Deterministic coarse-quantizer centroids (cid, cvec):
    * md5-ordered seed sample + one exact Lloyd step. */
  def ivfCentroids(s: SparkSession, dir: String): DataFrame =
    ivfCentroidsOf(
      Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
      IvfCells)

  /** The quantizer build over ANY (vec_id, embedding) relation — the
    * ONE definition the inline search, the materialized index and
    * the operating-point audit all share (an audit measuring a
    * different quantizer than the one served would be worthless). */
  private[graft] def ivfCentroidsOf(e: DataFrame, nCells: Int): DataFrame = {
    // Deterministic pseudo-random seed sample (both engines sort the
    // same md5 strings) — driver-bounded the way a KMeans sample is.
    // TakeOrdered: partition-local top-nCells, tiny driver merge.
    val seeds = e
      .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
      .limit(nCells)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))

    // Lloyd iteration 0: nearest seed per vector — map-only.
    val a0 = e.crossJoin(broadcast(asArray(seeds)))
      .select(col("vec_id"), col("embedding"),
        NearestCell(col("embedding"), col("cents")).as("cid"))

    // Exact per-dimension centroid means in fixed-point micro-units —
    // order-independent (a raw double sum would flake the oracle).
    // ElementwiseSum: bounded per-cell state, map-side combine, ONE
    // narrow shuffle (vs the round-2 posexplode → 64× row
    // amplification through two shuffles).
    a0.select(col("cid"), microInts(col("embedding")).as("mi"))
      .groupBy(col("cid"))
      .agg(graft.plans.ElementwiseSum(col("mi"), Dim).as("ms"),
        count(lit(1)).as("n"))
      .select(col("cid"), microMean(col("ms"), col("n")).as("cvec"))
  }

  /** k for the CONVERGED Lloyd clustering row (distinct from
    * [[IvfCells]] so the two quantizers stay independent dials). */
  private[graft] val KmK = 8

  /** One driver-resident Lloyd centroid — schema mirrors asArray's
    * (cid, cvec) struct exactly ([[NearestCell]]'s expected input). */
  private[graft] case class KmCent(cid: Long, cvec: Seq[Double])

  /** Loud iteration cap for [[kmeansConverged]] — the
    * q_rank_converged discipline: an under-converged result throws,
    * never returns silently. Measured first assignment-fixpoint:
    * 12 (sf0.001), 20 (sf0.01), 26 (sf0.1); 40 is the same ~1.5×
    * headroom RankMaxIters carries over its measured max. */
  private[graft] val KmMaxIters = 40

  /** q_kmeans — Lloyd's k-means run to ASSIGNMENT FIXPOINT (the full
    * clustering the one-step [[ivfCentroidsOf]] quantizer
    * approximates): seeds are the md5-ordered first [[KmK]] vectors
    * (the proven q_ann_ivf seeding), each iteration assigns every
    * vector to its nearest centroid with the native
    * [[graft.plans.NearestCell]] argmin (map-only — centroids ride
    * one broadcast array row) and recomputes exact fixed-point
    * centroid means ([[graft.plans.ElementwiseSum]], one narrow
    * shuffle of [[Dim]]-long states), stopping at the first
    * iteration whose assignment equals the previous one. Output is
    * the per-cluster audit (size + the exact micro-unit member
    * checksum that pins every final assignment) plus `conv_iter` —
    * the data-dependent stopping decision is itself graded, against
    * a [[KmMaxIters]]-stage unrolled oracle whose `conv_iter` scalar
    * is the same first-zero-changes rule (past the fixpoint the
    * assignment map is stationary, so the oracle's cap-stage stats
    * ARE the converged stats).
    *
    * Scale: per iteration ONE job — a map-only assignment pass
    * fused into one map-side-combined aggregate (k×[[Dim]] longs of
    * state per task) that carries centroid partials, member counts,
    * and the changed-count together; the corpus is materialized
    * once and never re-persisted. The BSP shape that holds at
    * 100 TB; iteration count is a property of the manifold, not the
    * corpus size. */
  def kmeansConverged(s: SparkSession, dir: String): DataFrame =
    kmeansConvergedOver(Tables.embeddings(s, dir))

  /** Executes as MLlib's KMeans does — a cached corpus RDD, driver-
    * resident centroids (k×[[Dim]] doubles), and per Lloyd step ONE
    * broadcast + one `mapPartitions` + a 32-partial reduce, via
    * [[graft.plans.KmeansKernel]]. This is the repo's second
    * sanctioned drop below the DataFrame API (after the multimodal
    * codec seam), and it is a measured decision, not a style one:
    * the step itself costs ~25 ms at sf0.1, but a DataFrame
    * formulation pays Catalyst analysis+optimization+codegen for a
    * FRESH plan every iteration (the centroids change, so the plan
    * changes) — measured 0.17-0.25 s/step against 0.03 s/step for
    * the identical reused physical plan. At 26 steps the planner,
    * not the engine, was 90% of the row's 5-6 s; no DataFrame
    * construct can reuse one compiled plan across data-dependent
    * iterations. The numerics stay in the SHARED kernels: per-row
    * assignment calls the same [[graft.plans.NearestCellUtil]].nearest
    * the [[graft.plans.NearestCell]] expression evals (on the same
    * InternalRow data, via `queryExecution.toRdd`), the fixed-point
    * micro encoding is computed ONCE by the [[microInts]] COLUMN
    * expression inside the cached projection (iteration-invariant,
    * so the loop never re-rounds), and the driver rebuilds means
    * with [[microMean]]'s exact IEEE op order (sum→double, /n,
    * /1e6). KmeansSpec pins the whole iteration against an
    * independent driver-side Lloyd recomputation AND asserts one
    * kernel step ≡ the pure-DataFrame step formulation.
    *
    * Stopping rule (unchanged semantics, graded by the unrolled
    * oracle): assignment t is a pure function of centroid set t, so
    * step job j keys by a_{j-1}, compares against a_{j-2} for the
    * changed count, and stops at the first step whose assignment
    * equals its predecessor; that step's partials ARE the converged
    * audit stats (past the fixpoint the map is stationary).
    *
    * Scale: the canonical BSP kmeans — broadcast O(k·Dim) down,
    * O(partitions·k·Dim) partials up, corpus partition-resident and
    * read-only; iteration count is a property of the manifold. */
  private[graft] def kmeansConvergedOver(e0: DataFrame): DataFrame = {
    val sp = e0.sparkSession
    import sp.implicits._
    val prepared = e0
      .select(col("vec_id"), col("embedding"),
        microInts(col("embedding")).as("mi"))
    val seeds: Seq[KmCent] = e0
      .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
      .limit(KmK)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => KmCent(r.getLong(0), r.getSeq[Double](1)))
      .toSeq
    val corpus = graft.plans.KmeansKernel.cacheCorpus(prepared)
    try {
      var prevC: Option[Seq[KmCent]] = None
      var curC: Seq[KmCent] = seeds
      var j = 0
      while (true) {
        j += 1
        val step = graft.plans.KmeansKernel.step(sp, corpus,
          curC.sortBy(_.cid).map(c => (c.cid, c.cvec.toArray)).toArray,
          prevC.map(_.sortBy(_.cid).map(c => (c.cid, c.cvec.toArray))
            .toArray))
        if (prevC.isDefined && step.moved == 0L) {
          // conv_iter = j-1 (first step whose assignment matches its
          // predecessor); this step's partials are keyed by exactly
          // that stationary assignment: sum_micro = Σ_dims ms
          // (= Σ_members row micro-sums — int64 addition commutes).
          val out = step.cells.map { c =>
            (c.cid, c.n, c.ms.sum, (j - 1).toLong)
          }.sortBy(_._1).toSeq
          return out.toDF("cluster_id", "n_members", "sum_micro",
            "conv_iter")
        }
        if (prevC.isDefined && j - 1 >= KmMaxIters)
          throw new IllegalStateException(
            s"k-means assignment still moving after $KmMaxIters Lloyd " +
              "steps — raise KmMaxIters for this corpus")
        // Centroid set j: microMean's exact op order, on the driver.
        prevC = Some(curC)
        curC = step.cells.map(c =>
          KmCent(c.cid, c.ms.toSeq.map(m => m.toDouble / c.n / 1e6)))
          .toSeq
      }
      sys.error("unreachable")
    } finally corpus.unpersist(blocking = false)
  }

  /** IVF search for query vec_id=0: deterministic coarse quantizer
    * (md5-ordered 16-seed sample, one exact Lloyd step), assign all
    * vectors to nearest centroid, probe the 2 cells nearest the
    * query, exact-cosine rank their members.
    *
    * Both Lloyd assignment passes are MAP-ONLY: the centroid table is
    * collapsed to a single broadcast array row and each vector picks
    * its cell with the fused native argmin
    * [[graft.plans.NearestCell]] — no corpus shuffle anywhere. (The
    * round-2 formulation crossJoined the centroids then
    * `groupBy(vec_id).agg(min(struct(d,cid)))`, shuffling the whole
    * corpus, embeddings included, through a 16×-amplified exchange —
    * twice.) The only aggregation that remains is the centroid-mean
    * build: one narrow shuffle of (cid, long[Dim]) rows via the
    * bounded [[graft.plans.ElementwiseSum]] — 16 cells × 64 longs,
    * constant-size regardless of corpus size. */
  def ivfSearch(s: SparkSession, dir: String, id: Long = 0L,
      k: Int = 10): DataFrame =
    ivfProbe(s, dir, id, k, lit(true))

  /** ONE probe pipeline for both the unfiltered and the filtered IVF
    * rows — the geometry (assignment, probe-cell cut, rank/limit,
    * tie-breaks) must never drift between the twins, so it has one
    * definition; `pred` is the member predicate (lit(true) for
    * q_ann_ivf, the label equality for q_ann_filtered). */
  private def ivfProbe(s: SparkSession, dir: String, id: Long, k: Int,
      pred: Column): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val centArr = broadcast(asArray(ivfCentroids(s, dir)))

    // Lloyd iteration 1 = final cell assignment — map-only again.
    val a1 = e.crossJoin(centArr)
      .select(col("vec_id"), col("embedding"), col("label"),
        NearestCell(col("embedding"), col("cents")).as("cell"))

    // Probe: the NProbe cells nearest the query vector (1 row × 16
    // cells — trivially small).
    val qcells = e.where(col("vec_id") === id).crossJoin(centArr)
      .select(col("embedding").as("qvec"), explode(col("cents")).as("c"))
      .select(col("c.cid").as("cell"), col("qvec"),
        dist2Builtin(col("qvec"), col("c.cvec")).as("qd"))
      .orderBy(col("qd").asc, col("cell").asc)
      .limit(NProbe)
      .select(col("cell"), col("qvec"))

    a1.where(col("vec_id") =!= id && pred)
      .join(broadcast(qcells), Seq("cell"))
      .select(col("vec_id"), col("cell"),
        cosineSim(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), col("cell"), round(col("sim"), 6).as("sim"))
  }

  /** Bound filter parameter of the prepared FILTERED probe — any
    * selective metadata predicate slots in here (the reference serves
    * attribute-filtered vector search; label is this corpus's only
    * vector-side attribute). A literal so Catalyst pushes it into the
    * parquet scan (plan-asserted). */
  val FilterLabel = 2

  /** Metadata-FILTERED IVF probe — the filtered-ANN serving shape
    * (the scale path of the brute-force q_vec_filtered): ONE standing
    * UNFILTERED index serves every predicate — the cell assignment is
    * built over the whole corpus, and the filter applies to the
    * probed cells' members as a PRE-filter, pushed below the probe
    * join all the way into the parquet scan (`PushedFilters:
    * EqualTo(label, …)`), so the distance computation touches only
    * matching rows of the probed cells. The alternative — post-
    * filtering an unfiltered top-k — silently loses recall whenever
    * the filter is selective (a k-cut before the predicate can leave
    * < k or even 0 survivors); this plan filters BEFORE the k-cut, so
    * it returns the true filtered top-k of the probed cells.
    *
    * Scale: identical probe geometry to [[ivfSearch]] (map-only
    * assignment vs broadcast centroids, NProbe bounded cells,
    * broadcast query row); the filter only SHRINKS the scanned set.
    * At 100 TB with cell-partitioned stored codes the same predicate
    * lands on the column store as a row-group skip. */
  def filteredIvfSearch(s: SparkSession, dir: String, id: Long = 0L,
      k: Int = 10): DataFrame =
    ivfProbe(s, dir, id, k, col("label") === FilterLabel)

  /** Squared L2 distance restricted to subspace `m` (1-based) —
    * sequential fold in ascending dimension order, the DuckDB-parity
    * order every distance in this file uses. */
  private def subdist(v: Column, sv: Column, m: Column): Column =
    subdistW(v, sv, m, PqSub)

  /** [[subdist]] with a parameterized subspace width — the harness
    * dial for the PqM×width trade at fixed code bytes. */
  private def subdistW(v: Column, sv: Column, m: Column, w: Int): Column =
    aggregate(
      zip_with(slice(v, (m - 1) * w + 1, lit(w)),
        slice(sv, (m - 1) * w + 1, lit(w)),
        (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, x) => acc + x)

  /** Product-quantization recall audit — the COMPRESSION tier of the
    * ANN story (LSH prunes candidates, IVF prunes cells; PQ shrinks
    * the residency cost of whatever still has to be scanned:
    * Dim=64 doubles → PqM=8 nibble codes per vector, 128×, so a
    * 100 TB vector corpus ADC-scans from ~0.8 TB of codes). Codebook:
    * the deterministic md5-ordered PqK-seed sample (the same
    * quantizer-seeding rule as IVF, sliced per subspace — a Lloyd
    * refinement would drop in exactly like ivfCentroids). Encoding is
    * MAP-ONLY: the codebook collapses to one broadcast array row and
    * each vector folds its PqM argmins with higher-order functions —
    * no corpus shuffle. Query time is asymmetric-distance (ADC): one
    * PqM×PqK lookup table from the query, every corpus distance is
    * PqM table lookups, and the top-k is TakeOrderedAndProject.
    * Like [[annRecall]], the output is the recall@k of ADC top-k vs
    * the exact-L2 top-k — deterministic on both engines, so the
    * audit itself is a hash-exact oracle row. */
  private val pqMs = sequence(lit(1), lit(PqM))

  /** Codebook: PqK seed vectors by md5 order, one broadcast row;
    * position j in the sid-sorted array IS the code value. */
  /** Un-hinted one-row codebook array — the form [[pqLloydRows]]
    * consumes: its seed-slice arm is the LEFT side of a left outer
    * join, where a broadcast hint is unsupported (Spark can only
    * build-right a left outer join) and draws a HintErrorLogger
    * warning per plan; the hint belongs only on crossJoin arms. */
  private def pqCodebookRow(cb: DataFrame): DataFrame =
    cb.agg(
      sort_array(collect_list(struct(col("sid"), col("sv")))).as("cb"))

  private def pqCodebookArr(cb: DataFrame): DataFrame =
    broadcast(pqCodebookRow(cb))

  private def pqSeeds(e: DataFrame): DataFrame =
    e.orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
      .limit(PqK)
      .select(col("vec_id").as("sid"), col("embedding").as("sv"))

  /** Codebook row for an arbitrary (vec_id, embedding) corpus —
    * exposed for the PqEncodeSpec parity harness. */
  private[graft] def pqCodebookFor(e: DataFrame): DataFrame =
    pqCodebookArr(pqSeeds(e))

  /** ADC lookup table from the query: dt[m][j] = subdist(q, cw_j, m);
    * one broadcast row. */
  private def pqDtArr(e: DataFrame, cbB: DataFrame, id: Long): DataFrame =
    broadcast(e.where(col("vec_id") === id).crossJoin(cbB)
      .select(transform(pqMs, m =>
        transform(col("cb"), s =>
          subdist(col("embedding"), s.getField("sv"), m))).as("dt")))

  /** Per-subspace argmin codeword over `cb` (ties to the smaller j,
    * DuckDB-identically) — the map-only encoder, as the fused native
    * kernel ([[graft.plans.PqEncode]]; whole-stage codegen, one loop
    * instead of PqM×PqK interpreted folds — the corpus-wide encode
    * pass is the PQ tier's hot path at 100 TB). Bit-identical to
    * [[pqCodesBuiltin]] (PqEncodeSpec). */
  private[graft] def pqCodes: Column =
    graft.plans.PqEncode(col("embedding"), col("cb"), PqM, PqSub)

  /** Composed-HOF reference formulation of [[pqCodes]] — kept for
    * the bit-parity cross-check. */
  private[graft] def pqCodesBuiltin: Column = transform(pqMs, m =>
    array_min(transform(col("cb"), (cw, j) =>
      struct(subdist(col("embedding"), cw.getField("sv"), m).as("d"),
        j.as("j")))).getField("j"))

  /** ADC estimate from a `codes` column and the broadcast `dt`:
    * PqM ascending-m table lookups. */
  private def adcEst: Column =
    aggregate(pqMs, lit(0.0d), (acc, m) => acc +
      element_at(element_at(col("dt"), m),
        element_at(col("codes"), m) + 1))

  /** Shortlist size for the exact-refine stage of [[ivfPqSearch]]. */
  val RefineR = 50

  /** IVF → PQ-ADC → exact-refine — the CANONICAL composed ANN
    * pipeline (the FAISS `IVFPQ + refine` shape; the reference's
    * single HNSW index plays this role, db/init.sql:50-58): the
    * coarse quantizer prunes the corpus to the query's [[NProbe]]
    * cells, ADC over the PQ codes ranks the survivors from 8 nibble
    * lookups each (never touching the full vectors), and only the
    * [[RefineR]]-row shortlist pays an exact cosine. Each tier is
    * separately graded (q_ann_ivf, q_ann_pq); this row grades their
    * COMPOSITION, which is what a deployment actually serves.
    *
    * Scale: assignment and encoding are map-only against broadcast
    * centroid/codebook rows; the probed-cell filter is a broadcast
    * semi-join on ≤ NProbe cell ids; ADC scans codes only (128×
    * smaller residency than the vectors); both cuts are bounded
    * TakeOrdered heaps; the exact rerank reads [[RefineR]] full
    * vectors — at 100 TB the only full-width reads are the shortlist
    * (the codes table and cell partition-pruning make everything
    * before it sub-linear). */
  def ivfPqSearch(s: SparkSession, dir: String, id: Long = 0L,
      k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val centArr = broadcast(asArray(ivfCentroids(s, dir)))
    val a1 = e.crossJoin(centArr)
      .select(col("vec_id"), col("embedding"),
        NearestCell(col("embedding"), col("cents")).as("cell"))
    val qcells = e.where(col("vec_id") === id).crossJoin(centArr)
      .select(explode(col("cents")).as("c"), col("embedding").as("qvec"))
      .select(col("c.cid").as("cell"),
        dist2Builtin(col("qvec"), col("c.cvec")).as("qd"))
      .orderBy(col("qd").asc, col("cell").asc)
      .limit(NProbe)
      .select(col("cell"))
    val cbB = pqCodebookArr(pqSeeds(e))
    val shortlist = a1.where(col("vec_id") =!= id)
      .join(broadcast(qcells), Seq("cell"))
      .crossJoin(cbB).crossJoin(pqDtArr(e, cbB, id))
      .select(col("vec_id"), pqCodes.as("codes"), col("dt"))
      .select(col("vec_id"), adcEst.as("est"))
      .orderBy(col("est").asc, col("vec_id").asc)
      .limit(RefineR)
      .select(col("vec_id"))
    val qvec = broadcast(e.where(col("vec_id") === id)
      .select(col("embedding").as("qvec")))
    e.join(broadcast(shortlist), Seq("vec_id"))
      .crossJoin(qvec)
      .select(col("vec_id"), cosineSim(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), round(col("sim"), 6).as("sim"))
  }

  /** RESIDUAL IVFPQ → exact-refine — [[ivfPqSearch]] in the FAISS
    * default configuration: PQ encodes v − centroid[cell] under a
    * codebook seeded from the residual corpus and refined by ONE
    * exact Lloyd step ([[pqLloydStep]] — the same sample-then-refine
    * rule the coarse quantizer uses). The operating-point harness
    * measured WHY this matters (ivfPqOperatingPoint doc: global
    * codebook 0.07 recall@10 vs residual forms ≥ 0.8 on the
    * clustered manifold); this row proves the residual pipeline is
    * hash-exactly reproducible — every stage (assignment, residuals,
    * micro-unit Lloyd means, per-subspace argmin encode, per-cell
    * ADC tables, refine) has a DuckDB twin.
    *
    * Scale: identical to [[ivfPqSearch]] plus one extra narrow
    * shuffle for the Lloyd means (PqM slices/vector, bounded
    * per-(m,code) state) — an index-BUILD cost, amortized over every
    * query served from the codes table. */
  def ivfPqResSearch(s: SparkSession, dir: String, id: Long = 0L,
      k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val centArr = broadcast(asArray(ivfCentroids(s, dir)))
    val withRes = e.crossJoin(centArr)
      .select(col("vec_id"), col("cents"),
        NearestCell(col("embedding"), col("cents")).as("cell"),
        col("embedding"))
      .select(col("vec_id"), col("cell"),
        zip_with(col("embedding"), cvecOfCell(col("cents"), col("cell")),
          (x, c) => x - c).as("res"))
    val res = withRes.select(col("vec_id"), col("res").as("embedding"))
    val cbB = pqLloydStep(res.select(col("embedding")),
      pqCodebookRow(pqSeedsK(res, PqK)))
    val qcells = e.where(col("vec_id") === id).crossJoin(centArr)
      .select(explode(col("cents")).as("c"), col("embedding").as("qvec"))
      .select(col("c.cid").as("cell"), col("c.cvec").as("cvec"),
        col("qvec"))
      .withColumn("qd", dist2Builtin(col("qvec"), col("cvec")))
      .orderBy(col("qd").asc, col("cell").asc)
      .limit(NProbe)
    val dts = qcells
      .select(col("cell"),
        zip_with(col("qvec"), col("cvec"), (x, c) => x - c).as("qres"))
      .crossJoin(cbB)
      .select(col("cell"), transform(pqMs, m =>
        transform(col("cb"), s2 =>
          subdist(col("qres"), s2.getField("sv"), m))).as("dt"))
    val shortlist = withRes.where(col("vec_id") =!= id)
      .join(broadcast(dts), Seq("cell"))
      .crossJoin(cbB)
      .select(col("vec_id"),
        graft.plans.PqEncode(col("res"), col("cb"), PqM, PqSub)
          .as("codes"),
        col("dt"))
      .select(col("vec_id"), adcEst.as("est"))
      .orderBy(col("est").asc, col("vec_id").asc)
      .limit(RefineR)
      .select(col("vec_id"))
    val qvec = broadcast(e.where(col("vec_id") === id)
      .select(col("embedding").as("qvec")))
    e.join(broadcast(shortlist), Seq("vec_id"))
      .crossJoin(qvec)
      .select(col("vec_id"),
        cosineSim(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), round(col("sim"), 6).as("sim"))
  }

  /** Query vectors for [[hardNegativesVec]]. */
  private[graft] val VecNegQueries = Seq(0L, 1L, 2L)
  private val VecNegK = 5

  /** SEMANTIC HARD-NEGATIVE MINING — the dense twin of
    * Retrieval.hardNegatives (embedding-model contrastive training
    * mines its negatives by ANN, not BM25): candidates come from the
    * query's IVF probed cells (the q_ann_ivf serving shape), exact-
    * cosine scored; positives — vectors sharing an embedding band
    * bucket with the query ([[Dedup.embBandKeysOf]], the exact
    * candidate definition q_dedup_embedding uses) — are removed by a
    * broadcast left-anti join; bounded top-[[VecNegK]] cut per query.
    * "High-similarity but NOT a near-duplicate" is precisely the
    * negative a contrastive trainer wants.
    *
    * Scale: the candidate pass is the IVF probe (map-only assignment
    * + broadcast probed-cell semi-join, O(bucket occupancy)); the
    * band-key pass is the dedup tier's standing surface; the
    * exclusion probe broadcasts ≤ |queries|×bands keys. One ANN pass
    * + one anti-join per mining batch. */
  def hardNegativesVec(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val (a1, centArr) = ivfServingSide(e)
    val w = org.apache.spark.sql.expressions.Window
    val qs = e.where(col("vec_id").isin(VecNegQueries: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val qcells = qs.crossJoin(broadcast(centArr))
      .select(col("qid"), col("qvec"), explode(col("cents")).as("c"))
      .select(col("qid"), col("qvec"), col("c.cid").as("cell"),
        dist2Builtin(col("qvec"), col("c.cvec")).as("qd"))
      .withColumn("rn", row_number().over(w.partitionBy(col("qid"))
        .orderBy(col("qd").asc, col("cell").asc)))
      .where(col("rn") <= NProbe)
      .select(col("qid"), col("qvec"), col("cell"))
    val cand = a1.join(broadcast(qcells), Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosineSim(col("embedding"), col("qvec")).as("sim"))
    val bands = Dedup.embBandKeysOf(e)
    val qb = bands.where(col("vec_id").isin(VecNegQueries: _*))
      .select(col("vec_id").as("qid"), col("bk"))
    val pos = bands.join(broadcast(qb), Seq("bk"))
      .select(col("qid"), col("vec_id")).distinct()
    // Broadcast the bounded exclusion set — without the hint the
    // anti-join plans SortMergeJoin and shuffles every candidate
    // (spec-asserted).
    cand.join(broadcast(pos), Seq("qid", "vec_id"), "left_anti")
      .withColumn("rank", row_number().over(w.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("vec_id").asc)))
      .where(col("rank") <= VecNegK)
      .select(col("qid"), col("rank"), col("vec_id"),
        round(col("sim"), 6).as("sim"))
      .orderBy(col("qid").asc, col("rank").asc)
  }

  /** ADC top-k (vec_id, est) for query `id` — encode + estimate in
    * one map-only projection, TakeOrdered top-k. */
  def pqTopK(s: SparkSession, dir: String, id: Long = 0L,
      k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val cbB = pqCodebookArr(pqSeeds(e))
    e.where(col("vec_id") =!= id).crossJoin(cbB)
      .crossJoin(pqDtArr(e, cbB, id))
      .select(col("vec_id"), pqCodes.as("codes"), col("dt"))
      .select(col("vec_id"), adcEst.as("est"))
      .orderBy(col("est").asc, col("vec_id").asc).limit(k)
  }

  def pqRecall(s: SparkSession, dir: String, id: Long = 0L,
      k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val pqTop = pqTopK(s, dir, id, k).select(col("vec_id"), lit(1).as("hit"))
    val q = e.where(col("vec_id") === id).select(col("embedding").as("qvec"))
    val brute = e.where(col("vec_id") =!= id).crossJoin(broadcast(q))
      .select(col("vec_id"),
        dist2Builtin(col("embedding"), col("qvec")).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc).limit(k)
      .select(col("vec_id"))
    brute.join(broadcast(pqTop), Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_brute"),
        sum(coalesce(col("hit"), lit(0))).as("n_hits"))
      .select(lit(k.toLong).as("k"), col("n_brute"), col("n_hits"),
        round(col("n_hits").cast("double") / k, 6).as("recall"))
  }

  /** Scalar 8-bit quantization (the FAISS `SQ8` tier — the MIDDLE
    * rung of the compression ladder this engine now covers end to
    * end: SQ8 8× / PQ 128× / IVFPQ+refine composed): every component
    * is affinely mapped onto [0, 255] by the corpus-wide min/max
    * trainer, and candidate ranking runs ENTIRELY in integer code
    * space — for a shared affine map, code-space squared L2 is
    * exactly proportional to reconstructed L2 (the per-dim Δ²
    * factors out), so the ranking needs no float reconstruction at
    * all and is hash-exact by construction (PQ's ADC needed
    * micro-unit care; SQ8's needs none — that is its operational
    * appeal). Output is the recall@k audit vs the exact scan, the
    * same contract as q_ann_pq.
    *
    * Scale: the trainer is ONE scalar min/max aggregation
    * (broadcast one-row); encoding is map-only; the scan reads
    * 64 bytes/vector instead of 512 (8×; at 100 TB the codes table
    * is what stays resident while vectors page); both cuts are
    * bounded TakeOrdered heaps. SQ8 composes with IVF cell pruning
    * exactly like PQ does in q_ann_ivfpq. */
  def sq8Recall(s: SparkSession, dir: String, id: Long = 0L,
      k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val gm = broadcast(e.agg(
      min(array_min(col("embedding"))).as("gmin"),
      max(array_max(col("embedding"))).as("gmax")))
    val coded = e.crossJoin(gm).select(col("vec_id"),
      transform(col("embedding"), v =>
        round(lit(255.0d) * (v - col("gmin")) /
          (col("gmax") - col("gmin"))).cast("int")).as("codes"))
    val qc = broadcast(coded.where(col("vec_id") === id)
      .select(col("codes").as("qcodes")))
    val approx = coded.where(col("vec_id") =!= id).crossJoin(qc)
      .select(col("vec_id"),
        aggregate(
          zip_with(col("codes"), col("qcodes"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d2"))
      .orderBy(col("d2").asc, col("vec_id").asc).limit(k)
      .select(col("vec_id"), lit(1).as("hit"))
    val q = e.where(col("vec_id") === id).select(col("embedding").as("qvec"))
    val brute = e.where(col("vec_id") =!= id).crossJoin(broadcast(q))
      .select(col("vec_id"),
        dist2Builtin(col("embedding"), col("qvec")).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc).limit(k)
      .select(col("vec_id"))
    brute.join(broadcast(approx), Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_brute"),
        sum(coalesce(col("hit"), lit(0))).as("n_hits"))
      .select(lit(k.toLong).as("k"), col("n_brute"), col("n_hits"),
        round(col("n_hits").cast("double") / k, 6).as("recall"))
  }

  /** Materialize the PQ index: the tiny codebook plus the corpus
    * reduced to (vec_id, codes) — the DEPLOYMENT shape of PQ, where
    * the ADC scan reads PqM small ints per vector instead of the
    * Dim-double embedding column (128× less I/O; at 100 TB the codes
    * table is the only thing a query touches). One map-only encode
    * pass, no shuffle. */
  def writePqIndex(s: SparkSession, dir: String, out: String): Unit = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    pqSeeds(e).write.mode("overwrite").parquet(s"$out/codebook")
    val cbB = pqCodebookArr(
      s.read.parquet(s"$out/codebook"))
    e.crossJoin(cbB)
      .select(col("vec_id"), pqCodes.as("codes"))
      .write.mode("overwrite").parquet(s"$out/codes")
  }

  /** Probe the materialized PQ index: the query's ADC table comes
    * from the stored codebook, and the corpus side reads ONLY the
    * codes table (PlanSpec-style proof in AnnIndexSpec: the scan's
    * ReadSchema carries no embedding column). Results equal
    * [[pqTopK]] exactly — stored codes are the same ints the inline
    * encoder produces, and the codebook's doubles round-trip parquet
    * bit-exactly. */
  def probePqIndex(s: SparkSession, dir: String, indexPath: String,
      id: Long = 0L, k: Int = 10): DataFrame = {
    val cbB = pqCodebookArr(s.read.parquet(s"$indexPath/codebook"))
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    s.read.parquet(s"$indexPath/codes")
      .where(col("vec_id") =!= id)
      .crossJoin(pqDtArr(e, cbB, id))
      .select(col("vec_id"), adcEst.as("est"))
      .orderBy(col("est").asc, col("vec_id").asc).limit(k)
  }

  /** Materialize the RESIDUAL IVFPQ index (the FAISS-default serving
    * configuration, [[ivfPqResSearch]]'s build half split out the way
    * [[writePqIndex]] splits flat PQ):
    *  - `centroids/` — the coarse quantizer (tiny);
    *  - `codebook/`  — the residual-seeded + one-Lloyd-step PQ
    *    codebook in (sid, sv) rows (tiny);
    *  - `codes/`     — the corpus reduced to (vec_id, codes),
    *    PARTITIONED BY cell, so a probe partition-prunes to its
    *    NProbe cell directories AND reads 8 nibble codes per vector
    *    instead of the 64-double embedding (the 100 TB residency
    *    story: sub-linear reads, 32× smaller rows).
    * The expensive part is the codebook TRAIN (sample + one exact
    * Lloyd shuffle) — a build-once cost this split amortizes over
    * every probe. */
  def writeResIvfPqIndex(s: SparkSession, dir: String, out: String): Unit = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    ivfCentroids(s, dir).write.mode("overwrite").parquet(s"$out/centroids")
    val centArr = broadcast(asArray(s.read.parquet(s"$out/centroids")))
    val withRes = e.crossJoin(centArr)
      .select(col("vec_id"), col("cents"),
        NearestCell(col("embedding"), col("cents")).as("cell"),
        col("embedding"))
      .select(col("vec_id"), col("cell"),
        zip_with(col("embedding"), cvecOfCell(col("cents"), col("cell")),
          (x, c) => x - c).as("res"))
    val res = withRes.select(col("vec_id"), col("res").as("embedding"))
    pqLloydRows(res.select(col("embedding")),
      pqCodebookRow(pqSeedsK(res, PqK)))
      .write.mode("overwrite").parquet(s"$out/codebook")
    val cbB = pqCodebookArr(s.read.parquet(s"$out/codebook"))
    withRes.crossJoin(cbB)
      .select(col("vec_id"), col("cell"),
        graft.plans.PqEncode(col("res"), col("cb"), PqM, PqSub).as("codes"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$out/codes")
  }

  /** Probe the materialized residual IVFPQ index: rank the query's
    * NProbe cells from the stored centroids, build per-cell ADC
    * tables over the query RESIDUAL from the stored codebook, ADC-
    * rank ONLY the probed cells' codes partitions (partition pruning
    * + codes-only ReadSchema, both asserted in AnnIndexSpec), exact-
    * refine the RefineR shortlist. Hash-identical to the inline
    * [[ivfPqResSearch]] (stored ≡ inline proven in AnnIndexSpec). */
  def probeResIvfPqIndex(s: SparkSession, dir: String, indexPath: String,
      id: Long = 0L, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val centArr = broadcast(asArray(s.read.parquet(s"$indexPath/centroids")))
    val cbB = pqCodebookArr(s.read.parquet(s"$indexPath/codebook"))
    val qcells = e.where(col("vec_id") === id).crossJoin(centArr)
      .select(explode(col("cents")).as("c"), col("embedding").as("qvec"))
      .select(col("c.cid").as("cell"), col("c.cvec").as("cvec"),
        col("qvec"))
      .withColumn("qd", dist2Builtin(col("qvec"), col("cvec")))
      .orderBy(col("qd").asc, col("cell").asc)
      .limit(NProbe)
    val dts = qcells
      .select(col("cell"),
        zip_with(col("qvec"), col("cvec"), (x, c) => x - c).as("qres"))
      .crossJoin(cbB)
      .select(col("cell"), transform(pqMs, m =>
        transform(col("cb"), s2 =>
          subdist(col("qres"), s2.getField("sv"), m))).as("dt"))
    val shortlist = s.read.parquet(s"$indexPath/codes")
      // partition-column inference narrows cell to int; restore long
      // so the probed-cell join key types line up
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        col("codes"))
      .where(col("vec_id") =!= id)
      .join(broadcast(dts), Seq("cell"))
      .select(col("vec_id"), adcEst.as("est"))
      .orderBy(col("est").asc, col("vec_id").asc)
      .limit(RefineR)
      .select(col("vec_id"))
    val qvec = broadcast(e.where(col("vec_id") === id)
      .select(col("embedding").as("qvec")))
    e.join(broadcast(shortlist), Seq("vec_id"))
      .crossJoin(qvec)
      .select(col("vec_id"),
        cosineSim(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), round(col("sim"), 6).as("sim"))
  }

  /** Layout-version string folded into the stored-index fingerprint:
    * any change to the PQ geometry, probe constants, or on-disk
    * format bumps the path, so a constants change can never serve a
    * stale /tmp index built under the old layout (the
    * Relational.BucketLayout convention). */
  private[graft] val ResIvfPqLayout =
    s"v2:cells=$IvfCells:probe=$NProbe:m=$PqM:k=$PqK:refine=$RefineR"

  /** Index location for [[ivfPqResStored]], keyed by a fingerprint of
    * the embeddings parquet (name/size/mtime) AND [[ResIvfPqLayout]]
    * so neither regenerated testdata nor a constants/encode change
    * can serve a stale index (the r7 testdata regeneration made the
    * first failure mode concrete; r8 ADVICE named the second). */
  private[graft] def resIvfPqIndexPath(dir: String): String =
    graft.IndexCache.path("graft_resivfpq", dir,
      Seq("embeddings.parquet"), ResIvfPqLayout)

  /** q_ann_ivfpq_res: serve the probe from the STORED index, building
    * it first only when absent for this exact data (fingerprinted
    * path above) — the deployment shape the row grades: train/encode
    * once, probe many. Unlike q_bm25_indexed (whose build is 3 cheap
    * data-invariant parquet writes, deliberately paid per execution),
    * the residual-PQ build contains the codebook TRAIN — folding it
    * into every serve would grade a cost no deployment pays per
    * query (r7 verdict). The inline twin [[ivfPqResSearch]] stays
    * the stored≡inline proof surface; both share the same oracle. */
  def ivfPqResStored(s: SparkSession, dir: String): DataFrame =
    probeResIvfPqIndex(s, dir,
      graft.IndexCache.ensure(resIvfPqIndexPath(dir))(
        tmp => writeResIvfPqIndex(s, dir, tmp)))

  /** Materialize the LSH index: the corpus written PARTITIONED BY its
    * bucket code. At 100 TB this is the one-off batch index build;
    * after it, a probe is a partition-pruned read of ≤ (1 +
    * NumPlanes) directories instead of a corpus scan (see
    * [[probeIndex]] and the PartitionFilters assertion in
    * AnnIndexSpec). */
  def writeLshIndex(s: SparkSession, dir: String, out: String): Unit =
    Tables.embeddings(s, dir)
      .withColumn("bucket", Lsh.bucketCode(col("embedding"), planes))
      .write.mode("overwrite").partitionBy("bucket").parquet(out)

  /** Probe the materialized index for query vec_id=`id`: the bucket
    * predicate is a PARTITION filter (directory pruning, no data
    * read outside the probed buckets); candidates are exact-cosine
    * ranked. */
  def probeIndex(s: SparkSession, dir: String, indexPath: String,
      id: Long = 0L, k: Int = 10): DataFrame = {
    val probes = Tables.embeddings(s, dir).where(col("vec_id") === id)
      .select(col("embedding").as("qvec"),
        Lsh.bucketCode(col("embedding"), planes).as("qb"))
      .select(col("qvec"), multiprobe(col("qb")).as("bucket"))
    s.read.parquet(indexPath)
      .join(broadcast(probes), Seq("bucket"))
      .where(col("vec_id") =!= id)
      .select(col("vec_id"), col("bucket"),
        cosineSim(col("embedding").cast("array<double>"), col("qvec"))
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), col("bucket"), round(col("sim"), 6).as("sim"))
  }

  /** Materialize the IVF index: centroids to `out`/centroids, the
    * corpus cell-assigned and written PARTITIONED BY cell to
    * `out`/data. The 100 TB one-off index build; probes after it are
    * partition-pruned reads of nprobe directories. */
  def writeIvfIndex(s: SparkSession, dir: String, out: String): Unit = {
    val cent = ivfCentroids(s, dir)
    cent.write.mode("overwrite").parquet(s"$out/centroids")
    val centArr = broadcast(asArray(s.read.parquet(s"$out/centroids")))
    Tables.embeddings(s, dir)
      .crossJoin(centArr)
      .select(col("vec_id"), col("embedding"),
        NearestCell(col("embedding"), col("cents")).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$out/data")
  }

  /** Probe the materialized IVF index for query vec_id=`id`: rank the
    * NProbe nearest cells from the tiny centroid table, then read
    * ONLY those cell directories (partition pruning) and exact-cosine
    * rank their members. Results equal [[ivfSearch]] exactly. */
  def probeIvfIndex(s: SparkSession, dir: String, indexPath: String,
      id: Long = 0L, k: Int = 10): DataFrame = {
    val centArr =
      broadcast(asArray(s.read.parquet(s"$indexPath/centroids")))
    val qcells = Tables.embeddings(s, dir).where(col("vec_id") === id)
      .crossJoin(centArr)
      .select(col("embedding").as("qvec"), explode(col("cents")).as("c"))
      .select(col("c.cid").as("cell"), col("qvec"),
        dist2Builtin(col("qvec"), col("c.cvec")).as("qd"))
      .orderBy(col("qd").asc, col("cell").asc)
      .limit(NProbe)
      .select(col("cell"), col("qvec"))
    s.read.parquet(s"$indexPath/data")
      .join(broadcast(qcells), Seq("cell"))
      .where(col("vec_id") =!= id)
      .select(col("vec_id"), col("cell"),
        cosineSim(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
      // partition-column type inference may narrow cell to int; cast
      // back so the schema matches ivfSearch exactly
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        round(col("sim"), 6).as("sim"))
  }

  /** LSH-accelerated batch kNN JOIN — the ANN scale path for
    * MULTI-query search (VectorSearch.knnJoin is the brute-force
    * twin: every query scans the whole corpus). Here each query
    * probes only its bucket ± 1-bit neighbors: corpus bucketing is
    * map-only, the probe side (queries × 9 buckets) broadcasts, the
    * candidate match is an equi-join on bucket, and per-query
    * ranking is the bounded [[graft.plans.TopKByScore]] aggregate —
    * at 100 TB the per-query work is proportional to bucket
    * occupancy, not corpus size. */
  def annKnnJoin(s: SparkSession, dir: String, nq: Long = 10L,
      k: Int = 5): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val corpus = e.where(col("vec_id") >= nq)
      .select(col("vec_id"), col("embedding"),
        Lsh.bucketCode(col("embedding"), planes).as("bucket"))
    val probes = e.where(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        Lsh.bucketCode(col("embedding"), planes).as("qb"))
      .select(col("qid"), col("qvec"), multiprobe(col("qb")).as("bucket"))
    corpus.join(broadcast(probes), Seq("bucket"))
      .select(col("qid"), col("vec_id"),
        cosineSim(col("embedding"), col("qvec")).as("sim"))
      .groupBy(col("qid"))
      .agg(graft.plans.TopKByScore(col("sim"), col("vec_id"), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")))
      .select(col("qid"), col("col.id").as("vec_id"),
        round(col("col.score"), 6).as("sim"),
        (col("pos") + 1).cast("int").as("rnk"))
      .orderBy(col("qid").asc, col("rnk").asc)
  }

  /** Measured LSH OPERATING POINT over an arbitrary (vec_id,
    * embedding) corpus: run the bucket+1-bit-multiprobe search with
    * `nPlanes` hyperplanes for the first `nQueries` ids, and return
    * (mean recall@k vs the exact brute-force top-k, mean fraction of
    * the corpus scored per query). This is the tuning surface a
    * deployment sweeps to pick planes/probes for ITS embedding
    * manifold — the number the reference implicitly trusts pgvector's
    * HNSW defaults for (db/init.sql:50-58 m=16, ef_construction=64).
    * On cluster-structured vectors (graft-synth `centers` option) the
    * measured point at 100k vectors is recall@10 ≈ 0.9+ under a <10%
    * scan — asserted in AnnIndexSpec; on near-isotropic vectors the
    * same machinery honestly reports ~0.3 (q_ann_recall), which is
    * the audit telling you NOT to replace the exact scan. */
  def lshOperatingPoint(corpus: DataFrame, nPlanes: Int, nQueries: Int,
      k: Int, dim: Int = Dim): (Double, Double) = {
    // dim parametric (r7): the same index machinery measures any
    // embedding space — incl. the 32-dim Matryoshka prefix space of
    // q_vec_multispace (AnnIndexSpec proves its operating point).
    val ps = Lsh.planes(nPlanes, dim)
    val coded = corpus
      .select(col("vec_id"), col("embedding"),
        Lsh.bucketCode(col("embedding"), ps).as("bucket"))
      .transform(graft.Checkpoints.cut)
    val n = coded.count()
    val qs = coded.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("bucket").as("qb"))
    val probes = qs.select(col("qid"), col("qvec"),
      multiprobe(col("qb"), nPlanes).as("bucket"))
    val cand = coded.join(broadcast(probes), Seq("bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosineSim(col("embedding"), col("qvec")).as("sim"))
      .transform(graft.Checkpoints.cut)
    val scanned = cand.count()
    val hits = topkIds(cand, k)
      .join(exactTopK(coded, nQueries, k), Seq("qid", "vec_id")).count()
    (hits.toDouble / (nQueries.toLong * k),
      scanned.toDouble / (nQueries.toLong * n))
  }

  /** Per-query top-k ids from a scored candidate relation
    * (qid, vec_id, sim) via the bounded TopKByScore aggregate. */
  private def topkIds(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("qid"))
      .agg(graft.plans.TopKByScore(col("sim"), col("vec_id"), k).as("tk"))
      .select(col("qid"), explode(col("tk")).as("h"))
      .select(col("qid"), col("h.id").as("vec_id"))

  /** Exact brute-force cosine top-k for queries vec_id < nQueries —
    * the ground truth every operating-point audit compares against. */
  private def exactTopK(e: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val qs = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    topkIds(
      e.select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(qs))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          cosineSim(col("embedding"), col("qvec")).as("sim")), k)
  }

  /** IVF twin of [[lshOperatingPoint]]: build the deterministic
    * coarse quantizer (md5-ordered `nCells` seed sample + one exact
    * Lloyd step) over an arbitrary corpus, probe the `nProbe` cells
    * nearest each query, and return (mean recall@k vs exact, mean
    * corpus fraction scored per query). Expected scan fraction is
    * ~nProbe/nCells on balanced cells — the dial a deployment turns
    * against its measured recall. */
  def ivfOperatingPoint(corpus: DataFrame, nCells: Int, nProbe: Int,
      nQueries: Int, k: Int): (Double, Double) = {
    val e = corpus.select(col("vec_id"), col("embedding"))
    val centArr = broadcast(asArray(ivfCentroidsOf(e, nCells)))
    val a1 = e.crossJoin(centArr)
      .select(col("vec_id"), col("embedding"),
        NearestCell(col("embedding"), col("cents")).as("cell"))
      .transform(graft.Checkpoints.cut)
    val n = a1.count()
    val qs = a1.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val qcells = qs.crossJoin(centArr)
      .select(col("qid"), explode(col("cents")).as("c"), col("qvec"))
      .select(col("qid"), col("c.cid").as("cell"),
        dist2Builtin(col("qvec"), col("c.cvec")).as("qd"))
      .groupBy(col("qid"))
      .agg(graft.plans.TopKByScore(-col("qd"), col("cell"), nProbe).as("tk"))
      .select(col("qid"), explode(col("tk")).as("h"))
      .select(col("qid"), col("h.id").as("cell"))
    val probes = qcells.join(qs, Seq("qid"))
    val cand = a1.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosineSim(col("embedding"), col("qvec")).as("sim"))
      .transform(graft.Checkpoints.cut)
    val scanned = cand.count()
    val hits = topkIds(cand, k)
      .join(exactTopK(e, nQueries, k), Seq("qid", "vec_id")).count()
    (hits.toDouble / (nQueries.toLong * k),
      scanned.toDouble / (nQueries.toLong * n))
  }

  /** The cvec whose cid equals `cell`, looked up in the broadcast
    * `cents` array (cids are seed-derived, NOT positions). */
  private def cvecOfCell(cents: Column, cell: Column): Column =
    element_at(filter(cents, c => c.getField("cid") === cell), 1)
      .getField("cvec")

  /** [[pqSeeds]] with a parameterized codebook size — the harness
    * dial for measuring the 4-bit (PqK=16) vs the FAISS-default
    * 8-bit (256) configuration. */
  private def pqSeedsK(e: DataFrame, kk: Int): DataFrame =
    e.orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
      .limit(kk)
      .select(col("vec_id").as("sid"), col("embedding").as("sv"))

  /** One exact Lloyd step per subspace over seed codebook `cb0`:
    * map-only argmin reassignment, then exact micro-unit means per
    * (subspace, codeword) — the same sample-then-refine rule as
    * [[ivfCentroidsOf]], applied to the PQ codebook. Codewords no
    * argmin selects keep their seed slice. One narrow shuffle of
    * (PqM rows × corpus) PqSub-wide slices. */
  private def pqLloydStep(e: DataFrame, cb0Row: DataFrame,
      mm: Int = PqM, w: Int = PqSub): DataFrame =
    pqCodebookArr(pqLloydRows(e, cb0Row, mm, w))

  /** [[pqLloydStep]] in storable (sid, sv) ROW form — what
    * [[writeResIvfPqIndex]] persists (the arr form above is its
    * broadcast view; parquet round-trips the doubles bit-exactly). */
  // Takes the UN-hinted codebook row ([[pqCodebookRow]]): the hint
  // is added here on the crossJoin arm only — seedSlices feeds the
  // LEFT of the outer join below, where a broadcast hint is a no-op
  // that warns (build-left is unsupported for left outer joins).
  private def pqLloydRows(e: DataFrame, cb0Row: DataFrame,
      mm: Int = PqM, w: Int = PqSub): DataFrame = {
    val cb0 = broadcast(cb0Row)
    val assigned = e.crossJoin(cb0)
      .select(col("embedding"),
        graft.plans.PqEncode(col("embedding"), col("cb"), mm, w)
          .as("codes"))
    val means = assigned
      .select(col("embedding"), posexplode(col("codes")).as(Seq("mi", "j")))
      .select(col("mi"), col("j"),
        microInts(slice(col("embedding"), col("mi") * lit(w) + lit(1),
          lit(w))).as("msub"))
      .groupBy(col("mi"), col("j"))
      .agg(graft.plans.ElementwiseSum(col("msub"), w).as("ms"),
        count(lit(1)).as("cnt"))
      .select(col("mi"), col("j"), microMean(col("ms"), col("cnt")).as("msv"))
    val seedSlices = cb0Row
      .select(posexplode(col("cb")).as(Seq("j", "s")))
      .select(col("j"), explode(sequence(lit(0), lit(mm - 1))).as("mi"),
        col("s.sv").as("fullsv"))
      .select(col("mi"), col("j"),
        slice(col("fullsv"), col("mi") * lit(w) + lit(1),
          lit(w)).as("ssv"))
    val cw = seedSlices.join(means, Seq("mi", "j"), "left")
      .select(col("j"), col("mi"), coalesce(col("msv"), col("ssv")).as("v"))
      .groupBy(col("j"))
      .agg(sort_array(collect_list(struct(col("mi"), col("v")))).as("parts"))
      .select(col("j").cast("long").as("sid"),
        flatten(transform(col("parts"), p => p.getField("v"))).as("sv"))
    cw
  }

  /** Composed-pipeline twin of [[ivfOperatingPoint]]: the same IVF
    * cell probe, but candidates are ranked by PQ-ADC (codes only)
    * and only the per-query `refineR` shortlist pays an exact
    * cosine. PQ here encodes RESIDUALS (v − centroid[cell], the
    * FAISS IVFPQ default): a shared global codebook spends its PqK
    * codewords re-describing the coarse structure the cell id
    * already names, and on a clustered manifold its within-cell
    * discrimination collapses — measured recall@10 was 0.07 at
    * refineR=50 and still 0.70 at refineR=1000. Encoding what the
    * cell does NOT know (the residual) restores the contrast; the
    * query pays one pqM×pqK table per probed cell instead of one
    * per query (nProbe× more table rows, still broadcast-tiny).
    *
    * Measured codebook grid on the 100k/64-center/σ=0.15 manifold
    * (recall@10 at refineR=50, 128 cells × 4 probes): global 4-bit
    * 0.07; residual 8×4-bit 0.24, +Lloyd 0.22; residual 8×8-bit
    * 0.51, +Lloyd 0.60; residual 16×8-bit+Lloyd 0.76 (0.86 at
    * refineR=100); residual 32×8-bit+Lloyd 0.91. The iid-Gaussian
    * residual is the hard case for PQ (distances concentrate), so
    * these are floor numbers for real embedding manifolds.
    * Returns (mean recall@k vs exact, ADC-scanned corpus fraction,
    * exact-scored corpus fraction). The third number is the one PQ
    * buys: full-width vector reads drop from scanFrac to
    * refineFrac ≈ refineR/n per query. */
  def ivfPqOperatingPoint(corpus: DataFrame, nCells: Int, nProbe: Int,
      refineR: Int, nQueries: Int, k: Int, pqK: Int = PqK,
      lloyd: Boolean = false, pqM: Int = PqM): (Double, Double, Double) = {
    val w = Dim / pqM
    val ms = sequence(lit(1), lit(pqM))
    val e = corpus.select(col("vec_id"), col("embedding"))
    val centArr = broadcast(asArray(ivfCentroidsOf(e, nCells)))
    // Cell + residual per vector — map-only against the broadcast
    // centroid row.
    val withRes = e.crossJoin(centArr)
      .select(col("vec_id"), col("cents"),
        NearestCell(col("embedding"), col("cents")).as("cell"),
        col("embedding"))
      .select(col("vec_id"), col("cell"),
        zip_with(col("embedding"), cvecOfCell(col("cents"), col("cell")),
          (x, c) => x - c).as("res"))
      .transform(graft.Checkpoints.cut)
    // Residual codebook: the same md5-ordered seed rule, over the
    // residual corpus; optionally one exact Lloyd refinement.
    val res = withRes.select(col("vec_id"), col("res").as("embedding"))
    val cbSeedRow = pqCodebookRow(pqSeedsK(res, pqK))
    val cbB = if (lloyd) pqLloydStep(res.select(col("embedding")),
      cbSeedRow, pqM, w) else broadcast(cbSeedRow)
    // What the materialized index stores: (cell, codes) — no full
    // vectors; one map-only encode pass.
    val a1 = withRes.crossJoin(cbB)
      .select(col("vec_id"), col("cell"),
        graft.plans.PqEncode(col("res"), col("cb"), pqM, w)
          .as("codes"))
      .transform(graft.Checkpoints.cut)
    val n = a1.count()
    val qs = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val qcells = qs.crossJoin(centArr)
      .select(col("qid"), explode(col("cents")).as("c"), col("qvec"))
      .select(col("qid"), col("c.cid").as("cell"),
        dist2Builtin(col("qvec"), col("c.cvec")).as("qd"))
      .groupBy(col("qid"))
      .agg(graft.plans.TopKByScore(-col("qd"), col("cell"), nProbe).as("tk"))
      .select(col("qid"), explode(col("tk")).as("h"))
      .select(col("qid"), col("h.id").as("cell"))
    // Per-(query, probed cell) ADC lookup tables over the QUERY
    // RESIDUAL in that cell's frame (nQueries × nProbe × PqM × PqK
    // doubles — broadcast-tiny).
    val dts = broadcast(qcells.join(qs, Seq("qid")).crossJoin(centArr)
      .select(col("qid"), col("cell"),
        zip_with(col("qvec"), cvecOfCell(col("cents"), col("cell")),
          (x, c) => x - c).as("qres"))
      .crossJoin(cbB)
      .select(col("qid"), col("cell"), transform(ms, m =>
        transform(col("cb"), s =>
          subdistW(col("qres"), s.getField("sv"), m, w))).as("dt")))
    val est = aggregate(ms, lit(0.0d), (acc, m) => acc +
      element_at(element_at(col("dt"), m),
        element_at(col("codes"), m) + 1))
    val cand = a1.join(broadcast(dts), Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), est.as("est"))
      .transform(graft.Checkpoints.cut)
    val scanned = cand.count()
    val shortlist = cand.groupBy(col("qid"))
      .agg(graft.plans.TopKByScore(-col("est"), col("vec_id"), refineR)
        .as("tk"))
      .select(col("qid"), explode(col("tk")).as("h"))
      .select(col("qid"), col("h.id").as("vec_id"))
    val refined = shortlist
      .join(e, Seq("vec_id"))
      .join(broadcast(qs), Seq("qid"))
      .select(col("qid"), col("vec_id"),
        cosineSim(col("embedding"), col("qvec")).as("sim"))
      .transform(graft.Checkpoints.cut)
    val exactScored = refined.count()
    val hits = topkIds(refined, k)
      .join(exactTopK(e, nQueries, k), Seq("qid", "vec_id")).count()
    (hits.toDouble / (nQueries.toLong * k),
      scanned.toDouble / (nQueries.toLong * n),
      exactScored.toDouble / (nQueries.toLong * n))
  }

  /** INCREMENTAL IVF index maintenance — the vector-side twin of
    * [[Dedup.incrementalDedup]] and the shape a continuously-ingested
    * vector corpus (the reference upserts embeddings batch after
    * batch, db/ingest_cards.py) runs on every refresh: the incoming
    * batch (vec_id % [[Dedup.IncrMod]] == 0, deterministic so the
    * oracle can replicate) assigns MAP-ONLY against the broadcast
    * standing-corpus centroids — the refresh DELTA is O(batch) work
    * with no re-clustering. The graded row, like q_ann_ivf, rebuilds
    * the standing quantizer and occupancy inline because the gate has
    * no storage between queries; a deployment reads both from the
    * materialized index ([[writeIvfIndex]] — centroid parquet + cell
    * partition sizes) so only the batch side is touched per refresh.
    * Output audits the append per cell: standing occupancy, appended
    * count, new total, and the mean squared distance of appended
    * members to their centroid (micro-unit fixed point — drift in
    * this number across refreshes is the production signal to
    * re-train the quantizer). */
  def ivfIncremental(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val isBatch = col("vec_id") % Dedup.IncrMod === 0
    val corpus = all.where(!isBatch)
    val batch = all.where(isBatch)
    val centRow = asArray(ivfCentroidsOf(corpus, IvfCells))
    val centArr = broadcast(centRow)

    // Standing occupancy: map-only argmin, counts only — no distance
    // arithmetic on the dominant (corpus) side.
    val nCorpus = corpus.crossJoin(centArr)
      .select(NearestCell(col("embedding"), col("cents")).as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n_corpus"))

    // Batch append: ONE pass yields cell AND distance — argmin over
    // (d2, cid) structs, ties to the smaller cid exactly like
    // NearestCell (the pqCodes encoder uses the same shape).
    val nBatch = batch.crossJoin(centArr)
      .select(array_min(transform(col("cents"), c =>
        struct(dist2Builtin(col("embedding"), c.getField("cvec")).as("d"),
          c.getField("cid").as("cid")))).as("m"))
      .select(col("m.cid").as("cell"), col("m.d").as("d2"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_batch"),
        sum(round(col("d2") * 1e6).cast("long")).as("sd"))

    // Base cell list from the un-hinted one-row plan (a broadcast
    // hint on the LEFT of a left join is unsupported and warns).
    centRow.select(explode(col("cents")).as("c"))
      .select(col("c.cid").as("cell"))
      .join(nCorpus, Seq("cell"), "left")
      .join(nBatch, Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("n_corpus"), lit(0L)).as("n_corpus"),
        coalesce(col("n_batch"), lit(0L)).as("n_batch"),
        (coalesce(col("n_corpus"), lit(0L)) +
          coalesce(col("n_batch"), lit(0L))).as("n_total"),
        when(col("n_batch").isNotNull,
          round(col("sd").cast("double") / col("n_batch") / 1e6, 6))
          .otherwise(lit(0.0d)).as("mean_d2"))
      .orderBy(col("cell").asc)
  }

  // ------------------------------------------------------------------
  // q_ann_graph: batch-built navigable k-NN graph + beam-search probe
  // — the graph-traversal index family the reference actually serves
  // from (pgvector HNSW, db/init.sql:50-58), re-expressed for batch
  // Spark: the BUILD is the distributed job (per-cell ring init +
  // hub layer + NN-descent sweeps, every stage a bounded equi-join),
  // the stored artifact is the edge table, and the PROBE evaluates
  // beam·deg·hops candidates — independent of cell occupancy, the
  // cost model HNSW trades on.
  // ------------------------------------------------------------------

  /** kNN-graph out-degree per node. */
  private[graft] val GraphDeg = 8
  /** Beam width of the probe. */
  private[graft] val GraphBeam = 8
  /** Unrolled beam hops (fixed, so the DuckDB oracle can mirror one
    * CTE stage per hop — the q_rank_converged discipline). */
  private[graft] val GraphHops = 4
  /** NN-descent refinement sweeps over the init graph. */
  private[graft] val GraphSweeps = 2

  /** Build the navigable kNN graph over any (vec_id, embedding)
    * corpus. Three deterministic stages, each a bounded equi-join:
    *
    *  1. SHARDED EXACT INIT — assign vectors to the
    *     [[ivfCentroidsOf]] coarse cells (map-only argmin) and seed
    *     each node with its `deg` nearest WITHIN-CELL neighbors by
    *     exact cosine (the DiskANN sharded-build shape; Σ occupancy²
    *     pairs, bounded by the cell-count dial exactly like
    *     q_dedup_semantic's verify). A ring over the [[Lsh]]
    *     hyperplane buckets adds similar-by-construction CROSS-CELL
    *     bridges (bucket mates agree on all [[NumPlanes]]
    *     hyperplanes). Measured on the 100k manifold: a random
    *     md5-ring init left NN-descent at 0.10 edge recall / 0.14-
    *     0.37 probe recall; the sharded-exact init reaches 0.85 edge
    *     recall and the probe clears the 0.8 bar.
    *  2. HUB LAYER — each cell's rank-1 (min-md5) node links to
    *     every other cell's rank-1 node (nCells² tiny rows): the
    *     HNSW upper layer's role, global navigability from any entry.
    *  3. NN-DESCENT sweeps — candidates(a) = current neighbors ∪
    *     neighbors-of-neighbors (both directions), keep the `deg`
    *     most similar per node ([[graft.plans.TopKByScore]], ties to
    *     the smaller id): each sweep costs O(n · (4·deg)²) scored
    *     pairs — bounded by construction, never occupancy-quadratic;
    *     the sweeps recover true neighbors the cell sharding split
    *     across sister cells.
    *
    * Hub edges are unioned back into the final graph (descent would
    * otherwise replace them with similar neighbors and strand the
    * entry layer).
    *
    * Takes the celled corpus `a1` = (vec_id, embedding, cell) — the
    * caller computes the quantizer + assignment ONCE and shares it
    * with the entry-node derivation (review finding: the previous
    * signature recomputed both, two full-corpus jobs per build). */
  private[graft] def knnGraphOf(a1: DataFrame, deg: Int,
      sweeps: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ringOver(part: DataFrame, key: String): DataFrame = {
      val wk = Window.partitionBy(col(key))
        .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
      val r = part.select(col(key), col("vec_id"),
        row_number().over(wk).as("rk"),
        count(lit(1)).over(Window.partitionBy(col(key))).as("nc"))
      r.select(col(key), col("vec_id").as("src"), col("rk"), col("nc"),
          explode(sequence(lit(1), lit(deg))).as("j"))
        .select(col(key), col("src"),
          (pmod(col("rk") - 1 + col("j"), col("nc")) + 1).as("trk"))
        .join(r.select(col(key), col("rk").as("trk"),
          col("vec_id").as("dst")), Seq(key, "trk"))
        .where(col("src") =!= col("dst"))
        .select(col("src"), col("dst"))
    }
    val wCell = Window.partitionBy(col("cell"))
      .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
    val rk = a1.select(col("vec_id"), col("cell"),
        row_number().over(wCell).as("rk"))
      .transform(graft.Checkpoints.cut)
    // Per-cell EXACT top-deg (the DiskANN sharded-build shape): the
    // within-cell pairwise join is Σ occupancy² — bounded by the cell
    // dial exactly like q_dedup_semantic's verify, and it seeds the
    // graph with the true within-cell neighbors directly.
    val cellKnn = a1.as("a")
      .join(a1.select(col("vec_id").as("bvid"),
        col("embedding").as("bemb"), col("cell")).as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("bvid"))
      .select(col("a.vec_id").as("src"), col("bvid").as("dst"),
        cosineSim(col("a.embedding"), col("bemb")).as("sim"))
      .groupBy(col("src"))
      .agg(graft.plans.TopKByScore(col("sim"), col("dst"), deg).as("tk"))
      .select(col("src"), explode(col("tk")).as("t"))
      .select(col("src"), col("t.id").as("dst"))
    val bring = ringOver(
      a1.select(col("vec_id"),
        Lsh.bucketCode(col("embedding"), planes).as("bucket")), "bucket")
    val hubs = rk.where(col("rk") === 1).select(col("vec_id").as("h"))
    val hubEdges = hubs
      .join(hubs.select(col("h").as("h2")), col("h") =!= col("h2"))
      .select(col("h").as("src"), col("h2").as("dst"))
      .transform(graft.Checkpoints.cut)
    val ev = a1.select(col("vec_id"), col("embedding"))
    var edges = cellKnn.unionAll(bring).unionAll(hubEdges).distinct()
      .transform(graft.Checkpoints.cut)
    for (_ <- 1 to sweeps) {
      val und = edges
        .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      val cand = und.as("a")
        .join(und.select(col("src").as("mid"), col("dst")).as("b"),
          col("a.dst") === col("b.mid"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .where(col("src") =!= col("dst"))
        .unionAll(und)
        .distinct()
      val scored = cand
        .join(ev.select(col("vec_id").as("src"), col("embedding").as("sv")),
          Seq("src"))
        .join(ev.select(col("vec_id").as("dst"), col("embedding").as("dv")),
          Seq("dst"))
        .select(col("src"), col("dst"),
          cosineSim(col("sv"), col("dv")).as("sim"))
      edges = scored.groupBy(col("src"))
        .agg(graft.plans.TopKByScore(col("sim"), col("dst"), deg).as("tk"))
        .select(col("src"), explode(col("tk")).as("t"))
        .select(col("src"), col("t.id").as("dst"))
        .transform(graft.Checkpoints.cut)
    }
    edges.unionAll(hubEdges).distinct()
  }

  /** Batched beam search over a built graph: every query advances in
    * the SAME jobs (per-hop: one frontier equi-join against the edge
    * table, one score join, one bounded top-beam aggregate) — no
    * driver loop over queries, no collect. `qs` = (qid, qvec);
    * `entries` = (qid, vec_id) seed nodes. Returns the EVALUATED set
    * (qid, vec_id, sim) — visited nodes; callers cut top-k / count
    * scan cost from it. Beam_t = the `beam` best of everything
    * evaluated so far (best-first over the visited set — simplest
    * deterministic schedule, and what the unrolled oracle mirrors);
    * frontier_t = unvisited out-neighbors of beam_{t-1}. Probe cost
    * per query ≤ 1 + hops · beam · deg evaluations, independent of
    * cell occupancy. */
  private[graft] def beamSearchAll(graph: DataFrame, e: DataFrame,
      qs: DataFrame, entries: DataFrame, beam: Int,
      hops: Int): DataFrame = {
    def scoreIds(ids: DataFrame) = ids.join(e, Seq("vec_id"))
      .join(qs, Seq("qid"))
      .select(col("qid"), col("vec_id"),
        cosineSim(col("embedding"), col("qvec")).as("sim"))
    var visited = scoreIds(entries).transform(graft.Checkpoints.cut)
    var beamDf = visited.select(col("qid"), col("vec_id"))
    for (_ <- 1 to hops) {
      val frontier = beamDf.select(col("qid"), col("vec_id").as("src"))
        .join(graph, Seq("src"))
        .select(col("qid"), col("dst").as("vec_id")).distinct()
        .join(visited, Seq("qid", "vec_id"), "left_anti")
      visited = visited.unionAll(scoreIds(frontier))
        .transform(graft.Checkpoints.cut)
      beamDf = visited.groupBy(col("qid"))
        .agg(graft.plans.TopKByScore(col("sim"), col("vec_id"), beam)
          .as("tk"))
        .select(col("qid"), explode(col("tk")).as("t"))
        .select(col("qid"), col("t.id").as("vec_id"))
    }
    visited
  }

  /** Score every (src, dst) edge with the same cosineSim the build's
    * sweeps used — ONE pass at build time so refresh-time consumers
    * (the insert's degree-cap prune) never re-join embeddings. */
  private[graft] def scoreEdges(edges: DataFrame,
      ev: DataFrame): DataFrame =
    edges
      .join(ev.select(col("vec_id").as("src"), col("embedding").as("sv")),
        Seq("src"))
      .join(ev.select(col("vec_id").as("dst"), col("embedding").as("dv")),
        Seq("dst"))
      .select(col("src"), col("dst"),
        cosineSim(col("sv"), col("dv")).as("sim"))

  /** Layout version for the STORED kNN-graph index (v3: edges carry
    * their cosine score — see [[scoreEdges]]). */
  private[graft] val AnnGraphLayout =
    s"v3:cells=$IvfCells:deg=$GraphDeg:sweeps=$GraphSweeps:" +
      s"planes=$NumPlanes:shardknn+bring+hubs:graph+entries+centroids:" +
      "edgesim"

  /** Fingerprint-keyed location of the stored kNN-graph index. */
  private[graft] def annGraphIndexPath(dir: String): String =
    graft.IndexCache.path("graft_anng_idx", dir,
      Seq("embeddings.parquet"), AnnGraphLayout)

  /** Build the stored kNN-graph index over the corpus (query vector
    * vec_id 0 excluded — it is the online side): the edge table, the
    * per-cell entry nodes, and the coarse centroids a query needs to
    * pick its entry cell. */
  private[graft] def writeAnnGraphIndex(s: SparkSession, dir: String,
      out: String): Unit =
    writeAnnGraphIndexOver(s,
      Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding"))
        .where(col("vec_id") =!= 0), out)

  /** The graph-index build over ANY (vec_id, embedding) relation —
    * one definition shared by the full-corpus index (q_ann_graph)
    * and the STANDING index the incremental row inserts into
    * (q_ann_graph_incr). */
  private[graft] def writeAnnGraphIndexOver(s: SparkSession,
      corpus: DataFrame, out: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    // ONE quantizer for everything in this index: centroids, graph
    // cells and entry ranks all derive from the corpus (query vector
    // excluded — it is the online side), so a probe's entry cell is
    // provably a cell of the graph it then walks. overwrite: a
    // failed build's pid+thread-keyed tmp dir must not wedge a
    // same-thread retry.
    ivfCentroidsOf(corpus, IvfCells)
      .write.mode("overwrite").parquet(s"$out/centroids")
    val centArr = broadcast(asArray(
      s.read.parquet(s"$out/centroids")))
    // Assign ONCE; the graph build and the entry-node derivation
    // share this pass (review finding: each recomputed it).
    val a1 = corpus.crossJoin(centArr)
      .select(col("vec_id"), col("embedding"),
        NearestCell(col("embedding"), col("cents")).as("cell"))
      .transform(graft.Checkpoints.cut)
    // Edges persist WITH their cosine score (r12, guide §2.3 "shuffle
    // keys and metadata instead of payloads"): the incremental
    // insert's degree-cap prune ranks a touched node's EXISTING
    // out-edges against the new reverse edges — with ids-only edges
    // that re-scoring re-joined the corpus-scale embedding table
    // twice per refresh; one extra scoring pass at BUILD time (paid
    // once, amortized over every refresh) makes the prune a map-only
    // probe of the edge table. 8 bytes/edge of storage.
    scoreEdges(knnGraphOf(a1, GraphDeg, GraphSweeps),
        a1.select(col("vec_id"), col("embedding")))
      .write.mode("overwrite").parquet(s"$out/graph")
    // Entry node per cell: the rank-1 (min-md5) member — the same
    // window the ring init used, over the same assignment.
    val wCell = Window.partitionBy(col("cell"))
      .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
    a1.select(col("cell"), col("vec_id"),
        row_number().over(wCell).as("rk"))
      .where(col("rk") === 1).select(col("cell"), col("vec_id"))
      .write.mode("overwrite").parquet(s"$out/entries")
  }

  private[graft] def ensureAnnGraphIndex(s: SparkSession,
      dir: String): String =
    graft.IndexCache.ensure(annGraphIndexPath(dir))(
      writeAnnGraphIndex(s, dir, _))

  /** Layout of the STANDING graph index q_ann_graph_incr inserts
    * into: the base layout plus the standing/batch split modulus it
    * filters by (bump-on-any-change — a modulus change must never
    * serve a stale store). Lazy for the same reason GraphIndexLayout
    * is: it interpolates a val from ANOTHER object (Dedup.IncrMod),
    * and a strict val would silently capture 0 under an unlucky
    * initialization order, freezing the store fingerprint. */
  private[graft] lazy val AnnGraphIncrLayout =
    AnnGraphLayout + s":standing=mod${Dedup.IncrMod}"

  private[graft] def annGraphIncrIndexPath(dir: String): String =
    graft.IndexCache.path("graft_anngi_idx", dir,
      Seq("embeddings.parquet"), AnnGraphIncrLayout)

  private[graft] def ensureAnnGraphIncrIndex(s: SparkSession,
      dir: String): String =
    graft.IndexCache.ensure(annGraphIncrIndexPath(dir))(out =>
      writeAnnGraphIndexOver(s,
        Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding"))
          .where(col("vec_id") % Dedup.IncrMod =!= 0), out))

  /** q_ann_graph — RECALL AUDIT of the graph index (the q_ann_recall
    * contract, applied to the graph family): beam search for query
    * vec_id 0 from the entry node of its nearest cell, k=10, vs the
    * exact brute-force top-10; emits (k, n_brute, n_hits, recall,
    * n_eval) where n_eval is the probe's total evaluated-candidate
    * count — the scan-cost disclosure (≤ 1 + hops·beam·deg = 257
    * here, vs probed-cell occupancy for IVF). The whole build→probe→
    * audit chain is deterministic, so the DuckDB oracle replays it
    * stage for stage (ring + hubs + unrolled descent sweeps +
    * unrolled beam hops) and the gate grades it hash-exact. */
  def annGraphRecall(s: SparkSession, dir: String, id: Long = 0L,
      k: Int = 10): DataFrame = {
    val idx = ensureAnnGraphIndex(s, dir)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
    val graph = s.read.parquet(s"$idx/graph")
    val centArr = broadcast(asArray(s.read.parquet(s"$idx/centroids")))
    val qs = e.where(col("vec_id") === id)
      .select(lit(id).as("qid"), col("embedding").as("qvec"))
    val qcell = qs.crossJoin(centArr)
      .select(col("qid"), NearestCell(col("qvec"), col("cents")).as("cell"))
    val entries = qcell
      .join(s.read.parquet(s"$idx/entries"), Seq("cell"))
      .select(col("qid"), col("vec_id"))
    // beamSearchAll's final hop already cut `visited` — no re-cut.
    val visited = beamSearchAll(graph, e, qs, entries, GraphBeam,
      GraphHops)
    val approx = visited
      .orderBy(col("sim").desc, col("vec_id").asc).limit(k)
      .select(col("vec_id"), lit(1).as("hit"))
    val q = e.where(col("vec_id") === id)
      .select(col("embedding").as("qvec"))
    val brute = e.where(col("vec_id") =!= id).crossJoin(broadcast(q))
      .select(col("vec_id"), cosineSim(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(k)
      .select(col("vec_id"))
    val nEval = visited.agg(count(lit(1)).as("n_eval"))
    brute.join(approx, Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_brute"),
        sum(coalesce(col("hit"), lit(0))).as("n_hits"))
      .crossJoin(broadcast(nEval))
      .select(lit(k.toLong).as("k"), col("n_brute"), col("n_hits"),
        round(col("n_hits").cast("double") / k, 6).as("recall"),
        col("n_eval"))
  }

  /** q_ann_graph_incr — INCREMENTAL maintenance of the graph index,
    * closing the index-maintenance matrix for the graph family (the
    * reference upserts embeddings batch after batch into its HNSW
    * index, db/ingest_cards.py ON CONFLICT over db/init.sql:50-58 —
    * pgvector's insert IS a beam-search-then-link walk): the
    * incoming batch (vec_id % [[Dedup.IncrMod]] == 0, the split
    * every incremental row shares) probes the STORED standing graph
    * ([[ensureAnnGraphIncrIndex]] — built once over the standing
    * corpus, fingerprint-keyed) and links in micro-batch-parallel
    * HNSW-insert fashion:
    *
    *  1. each batch vector beam-searches from its nearest cell's
    *     entry node (the SAME batched walk q_ann_graph serves with —
    *     ≤ 1 + hops·beam·deg standing vectors evaluated per insert,
    *     independent of corpus size);
    *  2. its OUT-edges are the [[GraphDeg]] most similar visited
    *     nodes (ties to the smaller id, the TopKByScore rule);
    *  3. REVERSE edges (standing node → new vector) respect the
    *     degree cap: each touched standing node keeps the
    *     [[GraphDeg]] best of (its existing out-edges ∪ the new
    *     reverse edges) — the HNSW neighbor-prune, bounded to
    *     batch·deg touched nodes.
    *
    * Probes are embarrassingly parallel against the FROZEN standing
    * graph (the micro-batch commit model: this batch's edges land
    * atomically at the end; the next batch sees them) — no
    * sequential insert dependency, which is the property that lets
    * the maintenance pass scale out. Per-insert audit row:
    * (vec_id, cell, n_eval, nn, n_out, n_rev_kept) — entry cell,
    * evaluated-candidate count (scan-cost disclosure), nearest
    * standing neighbor found, out-edges added, reverse edges
    * surviving the cap. The graded row reads the store and scans
    * batch vectors only — O(batch) work; the DuckDB oracle replays
    * standing build → batched probe → link stage for stage. */
  def annGraphInsert(s: SparkSession, dir: String): DataFrame = {
    val idx = ensureAnnGraphIncrIndex(s, dir)
    annGraphInsertFrom(s, dir,
      s.read.parquet(s"$idx/graph"),
      s.read.parquet(s"$idx/centroids"),
      s.read.parquet(s"$idx/entries"))
  }

  /** Spec-only twin of [[annGraphInsert]] that recomputes the
    * standing index IN-PLAN instead of reading the store — the
    * stored ≡ inline proof's other arm (the incrementalDedupInline
    * pattern). */
  private[graft] def annGraphInsertInline(s: SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val standing = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
      .where(col("vec_id") % Dedup.IncrMod =!= 0)
    val cents = ivfCentroidsOf(standing, IvfCells)
      .transform(graft.Checkpoints.cut)
    val a1 = standing.crossJoin(broadcast(asArray(cents)))
      .select(col("vec_id"), col("embedding"),
        NearestCell(col("embedding"), col("cents")).as("cell"))
      .transform(graft.Checkpoints.cut)
    val wCell = Window.partitionBy(col("cell"))
      .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
    val entries = a1.select(col("cell"), col("vec_id"),
        row_number().over(wCell).as("rk"))
      .where(col("rk") === 1).select(col("cell"), col("vec_id"))
    annGraphInsertFrom(s, dir,
      scoreEdges(knnGraphOf(a1, GraphDeg, GraphSweeps),
        a1.select(col("vec_id"), col("embedding"))),
      cents, entries)
  }

  /** The insert's constituent relations — (qcell, perQ, outE,
    * revKept) where perQ = the ONE per-insert aggregate
    * (qid, n_eval, tk = top-deg visited neighbors) every consumer
    * derives from, and revKept = the (d, nbr) out-pairs every
    * TOUCHED standing node keeps after the degree-cap prune. Exposed
    * so the navigability spec can assemble the post-insert graph
    * from exactly the relations the graded census aggregates. */
  private[graft] def annGraphInsertParts(s: SparkSession, dir: String,
      graph: DataFrame, centroids: DataFrame, entryByCell: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val all = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
    val standing = all.where(col("vec_id") % Dedup.IncrMod =!= 0)
    val batch = all.where(col("vec_id") % Dedup.IncrMod === 0)
    val centArr = broadcast(asArray(centroids))
    val qs = batch.select(col("vec_id").as("qid"),
      col("embedding").as("qvec"))
    // No eager cut: both consumers (entries, the final assembly)
    // live in plans where recomputing the map-only broadcast argmin
    // over the tiny batch is cheaper than a dedicated checkpoint job
    // (the nUe lesson).
    val qcell = qs.crossJoin(centArr)
      .select(col("qid"), NearestCell(col("qvec"), col("cents")).as("cell"))
    val entries = qcell
      .join(entryByCell, Seq("cell"))
      .select(col("qid"), col("vec_id"))
    // One batched walk for the whole batch (beamSearchAll's final
    // hop already cut `visited`).
    val visited = beamSearchAll(graph, standing, qs, entries,
      GraphBeam, GraphHops)
    // ONE per-insert aggregate serves every downstream consumer:
    // n_eval (count), the top-deg neighbor list (out-edges), its head
    // (nearest neighbor), and its top-2 prefix (the pinned
    // backlinks). The r11 shape ran four separate groupBy(qid) aggs
    // over the same cut relation — 3 extra shuffle+agg subtrees of
    // pure job-count overhead on a data-invariant row.
    val perQ = visited.groupBy(col("qid"))
      .agg(count(lit(1)).as("n_eval"),
        graft.plans.TopKByScore(col("sim"), col("vec_id"), GraphDeg)
          .as("tk"))
    // Out-edges: per insert, the deg best of everything evaluated.
    val outE = perQ
      .select(col("qid"), explode(col("tk")).as("t"))
      .select(col("qid"), col("t.id").as("d"), col("t.score").as("sim"))
    // Reverse prune: each TOUCHED standing node ranks its existing
    // out-edges (scored on demand — the stored graph is ids-only)
    // against the new reverse edges and keeps the deg best. Work is
    // bounded by batch·deg touched nodes × ≤2·deg candidates.
    // PINNED backlinks — ranked first via a +2.0 score boost (sims
    // live in [-1, 1], so the boost strictly dominates; both engines
    // add the same IEEE double), the HNSW keep-connected rule:
    //  - the insert's TOP-2 visited neighbors (without any pin a
    //    plain top-deg prune can evict an insert's every backlink
    //    and orphan it — observed at sf0.001 in r10; top-1 alone
    //    left the lone backlink holder falling off the search beam,
    //    28/30 findable);
    //  - the insert's CELL ENTRY node (the walk's hop-0 start for
    //    its cell), which makes self-findability STRUCTURAL: a walk
    //    for the inserted vector starts at that entry and evaluates
    //    its out-edges on the first hop — 30/30 in AnnIndexSpec's
    //    navigability walk at UNCHANGED probe cost (the beam-width
    //    alternative measured 29/30 at 1.5× n_eval and was
    //    rejected). When more than deg inserts land in one cell the
    //    entry keeps the deg best pinned edges — linkage then rides
    //    the neighbor pins (graceful, not silent: n_rev_kept
    //    discloses per insert).
    val touched = outE.select(col("d"))
      .unionAll(entries.select(col("vec_id").as("d"))).distinct()
    val ev = standing
    // The stored edges carry their build-time cosine score (layout
    // v3, [[scoreEdges]]) — the prune reads it instead of re-joining
    // the corpus-scale embedding table twice per refresh (r12: two
    // shuffle joins + re-scoring dropped from every refresh; the
    // probe of the edge table is map-only against the broadcast
    // touched set).
    val exOut = graph.join(broadcast(touched), graph("src") === col("d"))
      .select(col("src").as("d"), col("dst").as("nbr"), col("sim"))
    val pin2 = perQ
      .select(col("qid"),
        transform(slice(col("tk"), 1, 2), x => x.getField("id"))
          .as("pin"))
    val entryEdge = entries
      .join(qs, Seq("qid"))
      .join(ev.select(col("vec_id"), col("embedding").as("evec")),
        Seq("vec_id"))
      .select(col("vec_id").as("d"), col("qid").as("nbr"),
        (cosineSim(col("evec"), col("qvec")) + lit(2.0d)).as("sim"))
    // An entry that is ALSO a top-2 neighbor would contribute the
    // same (d, nbr) edge twice — collapse to one candidate row (max
    // sim) before the rank, or the kept list double-counts it.
    val revNew = outE.join(pin2, Seq("qid"))
      .select(col("d"), col("qid").as("nbr"),
        (col("sim") + when(array_contains(col("pin"), col("d")), lit(2.0d))
          .otherwise(lit(0.0d))).as("sim"))
      .unionAll(entryEdge)
      .groupBy(col("d"), col("nbr")).agg(max(col("sim")).as("sim"))
    val revKept = exOut.unionAll(revNew).groupBy(col("d"))
      .agg(graft.plans.TopKByScore(col("sim"), col("nbr"), GraphDeg)
        .as("tk"))
      .select(col("d"), explode(col("tk")).as("t"))
      .select(col("d"), col("t.id").as("nbr"))
    (qcell, perQ, outE, revKept)
  }

  private def annGraphInsertFrom(s: SparkSession, dir: String,
      graph: DataFrame, centroids: DataFrame,
      entryByCell: DataFrame): DataFrame = {
    val (qcell, perQ, _, revKept) =
      annGraphInsertParts(s, dir, graph, centroids, entryByCell)
    val nRev = revKept.where(col("nbr") % Dedup.IncrMod === 0)
      .groupBy(col("nbr").as("qid"))
      .agg(count(lit(1)).as("n_rev_kept"))
    // n_eval, nn, n_out all project off the ONE perQ aggregate (the
    // r11 assembly re-aggregated visited three more times here).
    qcell.join(perQ, Seq("qid")).join(nRev, Seq("qid"), "left")
      .select(col("qid").as("vec_id"), col("cell"), col("n_eval"),
        col("tk").getItem(0).getField("id").as("nn"),
        size(col("tk")).cast("long").as("n_out"),
        coalesce(col("n_rev_kept"), lit(0L)).as("n_rev_kept"))
      .orderBy(col("vec_id").asc)
  }

  /** Graph twin of [[lshOperatingPoint]]: build the kNN graph over
    * an arbitrary corpus, beam-probe `nQueries` queries in ONE
    * batched search, and return (mean recall@k vs exact, mean corpus
    * fraction evaluated per query) — the operating point the graph
    * family is adopted (or not) on, measured next to LSH/IVF/IVFPQ
    * on the same manifold (AnnIndexSpec). */
  def graphOperatingPoint(corpus: DataFrame, nCells: Int, deg: Int,
      sweeps: Int, beam: Int, hops: Int, nQueries: Int,
      k: Int): (Double, Double) = {
    import org.apache.spark.sql.expressions.Window
    val e = corpus.select(col("vec_id"), col("embedding"))
      .transform(graft.Checkpoints.cut)
    val n = e.count()
    // One quantizer + one assignment, shared by the build and the
    // entry derivation (the writeAnnGraphIndex discipline).
    val centArr = broadcast(asArray(ivfCentroidsOf(e, nCells)))
    val a1 = e.crossJoin(centArr)
      .select(col("vec_id"), col("embedding"),
        NearestCell(col("embedding"), col("cents")).as("cell"))
      .transform(graft.Checkpoints.cut)
    val graph = knnGraphOf(a1, deg, sweeps)
      .transform(graft.Checkpoints.cut)
    val wCell = Window.partitionBy(col("cell"))
      .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
    val entryByCell = a1.select(col("cell"), col("vec_id"),
        row_number().over(wCell).as("rk"))
      .where(col("rk") === 1).select(col("cell"), col("vec_id"))
    val qs = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val entries = qs.crossJoin(centArr)
      .select(col("qid"), NearestCell(col("qvec"), col("cents")).as("cell"))
      .join(entryByCell, Seq("cell"))
      .select(col("qid"), col("vec_id"))
    // beamSearchAll's final hop already cut `visited`; the qid
    // self-filter is a cheap post-map over that checkpoint.
    val visited = beamSearchAll(graph, e, qs, entries, beam, hops)
      .where(col("vec_id") =!= col("qid"))
    val evaluated = visited.count()
    val hits = topkIds(visited, k)
      .join(exactTopK(e, nQueries, k), Seq("qid", "vec_id")).count()
    (hits.toDouble / (nQueries.toLong * k),
      evaluated.toDouble / (nQueries.toLong * n))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_lsh_bucket" -> ((s, d) => lshBucketSearch(s, d)),
    "q_ann_ivf" -> ((s, d) => ivfSearch(s, d)),
    "q_ann_filtered" -> ((s, d) => filteredIvfSearch(s, d)),
    "q_ann_knn_join" -> ((s, d) => annKnnJoin(s, d)),
    "q_ann_recall" -> ((s, d) => annRecall(s, d)),
    "q_ann_pq" -> ((s, d) => pqRecall(s, d)),
    "q_ann_sq8" -> ((s, d) => sq8Recall(s, d)),
    "q_ann_incremental" -> ((s, d) => ivfIncremental(s, d)),
    "q_ann_ivfpq" -> ((s, d) => ivfPqSearch(s, d)),
    "q_ann_ivfpq_res" -> ((s, d) => ivfPqResStored(s, d)),
    "q_ann_graph" -> ((s, d) => annGraphRecall(s, d)),
    "q_ann_graph_incr" -> ((s, d) => annGraphInsert(s, d)),
    "q_hard_negatives_vec" -> ((s, d) => hardNegativesVec(s, d)),
    "q_kmeans" -> ((s, d) => kmeansConverged(s, d)),
  )

  /** Stage `t` of the unrolled k-means oracle: centroids from the
    * previous assignment, re-assignment, and the changed-row count
    * that drives the conv_iter scalar. */
  // AS MATERIALIZED on every stage CTE (the q_rank_converged oracle
  // discipline): each a{t} is referenced by two downstream CTEs, and
  // without the hint DuckDB inlines the whole prior chain into each
  // reference — exponential plan blowup across 40 stages.
  private def kmStage(t: Int): String =
    s"""c$t AS MATERIALIZED (SELECT cid, list(c ORDER BY pos) AS cv FROM (
       |  SELECT a.cid, g.i AS pos,
       |         CAST(sum(CAST(round(e.v[g.i] * 1e6) AS BIGINT)) AS DOUBLE)
       |           / count(*) / 1e6 AS c
       |  FROM a${t - 1} a JOIN e USING (vec_id),
       |       generate_series(1, $Dim) AS g(i)
       |  GROUP BY a.cid, g.i) GROUP BY cid),
       |a$t AS MATERIALIZED (SELECT vec_id, cid FROM (
       |  SELECT e.vec_id, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |           list_sum([(e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])
       |                     for i in generate_series(1, $Dim)]) ASC,
       |           c.cid ASC) AS rn
       |  FROM e, c$t c) WHERE rn = 1),
       |g$t AS MATERIALIZED (SELECT CAST($t AS BIGINT) AS t, count(*) AS chg
       |        FROM a$t n JOIN a${t - 1} p USING (vec_id)
       |        WHERE n.cid <> p.cid)""".stripMargin

  private def kmeansOracle: String =
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v
       |       FROM embeddings),
       |seeds AS MATERIALIZED (SELECT vec_id AS cid, v AS cv FROM e
       |          ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
       |          LIMIT $KmK),
       |a0 AS MATERIALIZED (SELECT vec_id, cid FROM (
       |  SELECT e.vec_id, s.cid,
       |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |           list_sum([(e.v[i] - s.cv[i]) * (e.v[i] - s.cv[i])
       |                     for i in generate_series(1, $Dim)]) ASC,
       |           s.cid ASC) AS rn
       |  FROM e, seeds s) WHERE rn = 1),
       |${(1 to KmMaxIters).map(kmStage).mkString(",\n")},
       |conv AS (SELECT min(t) AS ci FROM (
       |  ${(1 to KmMaxIters).map(t => s"SELECT * FROM g$t")
             .mkString(" UNION ALL ")}) WHERE chg = 0),
       |rs AS (SELECT vec_id,
       |              CAST(list_sum([CAST(round(v[i] * 1e6) AS BIGINT)
       |                   for i in generate_series(1, $Dim)]) AS BIGINT)
       |                AS rsum
       |       FROM e)
       |SELECT a.cid AS cluster_id, count(*) AS n_members,
       |       CAST(sum(rs.rsum) AS BIGINT) AS sum_micro,
       |       (SELECT ci FROM conv) AS conv_iter
       |FROM a$KmMaxIters a JOIN rs USING (vec_id)
       |GROUP BY a.cid ORDER BY cluster_id ASC""".stripMargin

  private val bucketSql = Lsh.bucketCodeSql("v", planes)
  private val probeXors =
    (0 +: (0 until NumPlanes).map(1 << _)).map(m => s"xor(qb, $m)")
      .mkString("[", ", ", "]")

  /** Subspace-m squared L2 between lists `a` and `b` as a DuckDB
    * comprehension — same ascending-dimension fold as [[subdist]]. */
  private def sqlSubdist(a: String, b: String, m: String): String =
    s"""list_sum([($a[($m-1)*$PqSub + i] - $b[($m-1)*$PqSub + i])
       | * ($a[($m-1)*$PqSub + i] - $b[($m-1)*$PqSub + i])
       | for i in generate_series(1, $PqSub)])""".stripMargin

  /** ONE oracle CTE chain for both IVF probe rows — the SQL twin of
    * [[ivfProbe]]'s single definition; `resFilter` is the member
    * predicate appended to the candidate stage ("" for q_ann_ivf,
    * the label equality for q_ann_filtered). */
  private def ivfOracle(resFilter: String): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
       |           FROM embeddings),
       |seeds AS (SELECT vec_id AS sid, v AS sv FROM e
       |          ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
       |          LIMIT $IvfCells),
       |d0 AS (SELECT e.vec_id, s.sid,
       |              list_sum([(e.v[i] - s.sv[i]) * (e.v[i] - s.sv[i])
       |                        for i in generate_series(1, $Dim)]) AS d
       |       FROM e, seeds s),
       |a0 AS (SELECT vec_id, sid AS cid FROM (
       |         SELECT vec_id, sid,
       |                row_number() OVER (PARTITION BY vec_id
       |                  ORDER BY d ASC, sid ASC) AS rn
       |         FROM d0) WHERE rn = 1),
       |dims AS (SELECT a0.cid, g.i AS pos,
       |                CAST(round(e.v[g.i] * 1e6) AS BIGINT) AS m
       |         FROM a0 JOIN e USING (vec_id),
       |              generate_series(1, $Dim) AS g(i)),
       |cdim AS (SELECT cid, pos, CAST(sum(m) AS DOUBLE) / count(*) / 1e6 AS c
       |         FROM dims GROUP BY cid, pos),
       |cent AS (SELECT cid, list(c ORDER BY pos) AS cv
       |         FROM cdim GROUP BY cid),
       |d1 AS (SELECT e.vec_id, t.cid,
       |              list_sum([(e.v[i] - t.cv[i]) * (e.v[i] - t.cv[i])
       |                        for i in generate_series(1, $Dim)]) AS d
       |       FROM e, cent t),
       |a1 AS (SELECT vec_id, cid AS cell FROM (
       |         SELECT vec_id, cid,
       |                row_number() OVER (PARTITION BY vec_id
       |                  ORDER BY d ASC, cid ASC) AS rn
       |         FROM d1) WHERE rn = 1),
       |qc AS (SELECT t.cid AS cell, q.v AS qv
       |       FROM cent t, (SELECT v FROM e WHERE vec_id = 0) q
       |       ORDER BY list_sum([(q.v[i] - t.cv[i]) * (q.v[i] - t.cv[i])
       |                          for i in generate_series(1, $Dim)]) ASC,
       |                t.cid ASC
       |       LIMIT $NProbe),
       |res AS (SELECT a1.vec_id, a1.cell,
       |               list_cosine_similarity(e.v, qc.qv) AS sim
       |        FROM a1 JOIN qc USING (cell) JOIN e USING (vec_id)
       |        WHERE a1.vec_id <> 0$resFilter)
       |SELECT vec_id, cell, round(sim, 6) AS sim FROM res
       |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin

  /** Unrolled oracle for [[annGraphRecall]] — replays the whole
    * build→probe→audit chain stage for stage: quantizer (the
    * ivfOracle CTE prefix over the corpus WITHOUT the query vector),
    * per-cell md5-rank ring init, hub layer, [[GraphSweeps]] unrolled
    * NN-descent sweeps, [[GraphHops]] unrolled beam hops, then the
    * q_ann_recall comparison against the brute-force top-10 plus the
    * evaluated-candidate count. */
  private def graphSweepCte(i: Int, prev: String): String =
    s"""u$i AS MATERIALIZED (SELECT src, dst FROM $prev
       |  UNION ALL SELECT dst AS src, src AS dst FROM $prev),
       |n$i AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |    SELECT a.src AS src, b.dst AS dst
       |    FROM u$i a JOIN u$i b ON a.dst = b.src WHERE b.dst <> a.src
       |    UNION ALL SELECT src, dst FROM u$i)),
       |s$i AS MATERIALIZED (SELECT n$i.src, n$i.dst,
       |    list_cosine_similarity(ca.v, cb.v) AS sim
       |  FROM n$i JOIN c ca ON ca.vec_id = n$i.src
       |           JOIN c cb ON cb.vec_id = n$i.dst),
       |g$i AS MATERIALIZED (SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src
       |      ORDER BY sim DESC, dst ASC) AS rn FROM s$i)
       |  WHERE rn <= $GraphDeg),""".stripMargin

  /** The standing-graph BUILD as a CTE prefix (e → … → gf), shared
    * by [[annGraphOracle]] (standing = all but the online query
    * vector) and [[annGraphIncrOracle]] (standing = the non-batch
    * split) — one SQL definition of the build, exactly like
    * [[writeAnnGraphIndexOver]] is the one Spark definition. */
  private def graphBuildCtes(standingWhere: String): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c AS MATERIALIZED (SELECT vec_id, v FROM e WHERE $standingWhere),
       |seeds AS MATERIALIZED (SELECT vec_id AS sid, v AS sv FROM c
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
       |  LIMIT $IvfCells),
       |d0 AS MATERIALIZED (SELECT c.vec_id, s.sid,
       |    list_sum([(c.v[i] - s.sv[i]) * (c.v[i] - s.sv[i])
       |              for i in generate_series(1, $Dim)]) AS d
       |  FROM c, seeds s),
       |a0 AS MATERIALIZED (SELECT vec_id, sid AS cid FROM (
       |    SELECT vec_id, sid, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY d ASC, sid ASC) AS rn FROM d0) WHERE rn = 1),
       |dims AS MATERIALIZED (SELECT a0.cid, g.i AS pos,
       |    CAST(round(c.v[g.i] * 1e6) AS BIGINT) AS m
       |  FROM a0 JOIN c USING (vec_id),
       |       generate_series(1, $Dim) AS g(i)),
       |cdim AS MATERIALIZED (SELECT cid, pos,
       |    CAST(sum(m) AS DOUBLE) / count(*) / 1e6 AS cm
       |  FROM dims GROUP BY cid, pos),
       |cent AS MATERIALIZED (SELECT cid, list(cm ORDER BY pos) AS cv
       |  FROM cdim GROUP BY cid),
       |d1 AS MATERIALIZED (SELECT c.vec_id, t.cid,
       |    list_sum([(c.v[i] - t.cv[i]) * (c.v[i] - t.cv[i])
       |              for i in generate_series(1, $Dim)]) AS d
       |  FROM c, cent t),
       |a1 AS MATERIALIZED (SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY d ASC, cid ASC) AS rn FROM d1) WHERE rn = 1),
       |rk AS MATERIALIZED (SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY cell
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) AS rk
       |  FROM a1),
       |ck AS MATERIALIZED (SELECT src, dst FROM (
       |    SELECT a.vec_id AS src, b.vec_id AS dst,
       |           row_number() OVER (PARTITION BY a.vec_id
       |             ORDER BY list_cosine_similarity(ea.v, eb.v) DESC,
       |                      b.vec_id ASC) AS rn
       |    FROM a1 a JOIN a1 b ON a.cell = b.cell
       |                       AND a.vec_id <> b.vec_id
       |    JOIN c ea ON ea.vec_id = a.vec_id
       |    JOIN c eb ON eb.vec_id = b.vec_id)
       |  WHERE rn <= $GraphDeg),
       |bk AS MATERIALIZED (SELECT vec_id, bucket,
       |    row_number() OVER (PARTITION BY bucket
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) AS rk,
       |    count(*) OVER (PARTITION BY bucket) AS nc
       |  FROM (SELECT vec_id, $bucketSql AS bucket FROM c)),
       |bring AS MATERIALIZED (SELECT DISTINCT a.vec_id AS src,
       |    b.vec_id AS dst
       |  FROM bk a, generate_series(1, $GraphDeg) g(j), bk b
       |  WHERE b.bucket = a.bucket AND b.rk = (a.rk - 1 + g.j) % a.nc + 1
       |    AND b.vec_id <> a.vec_id),
       |hubs AS MATERIALIZED (SELECT vec_id AS h FROM rk WHERE rk = 1),
       |hubE AS MATERIALIZED (SELECT a.h AS src, b.h AS dst
       |  FROM hubs a, hubs b WHERE a.h <> b.h),
       |g0 AS MATERIALIZED (SELECT src, dst FROM ck
       |  UNION SELECT src, dst FROM bring
       |  UNION SELECT src, dst FROM hubE),
       |${graphSweepCte(1, "g0")}
       |${graphSweepCte(2, "g1")}
       |gf AS MATERIALIZED (SELECT src, dst FROM g2
       |  UNION SELECT src, dst FROM hubE),""".stripMargin

  private def annGraphOracle: String = {
    def hop(i: Int): String =
      s"""f$i AS MATERIALIZED (SELECT DISTINCT g.dst AS vec_id
         |  FROM gf g JOIN b${i - 1} ON g.src = b${i - 1}.vec_id
         |  WHERE g.dst NOT IN (SELECT vec_id FROM v${i - 1})),
         |v$i AS MATERIALIZED (SELECT vec_id, sim FROM v${i - 1}
         |  UNION ALL SELECT c.vec_id,
         |    list_cosine_similarity(c.v, (SELECT v FROM qv)) AS sim
         |  FROM c JOIN f$i USING (vec_id)),
         |b$i AS MATERIALIZED (SELECT vec_id FROM v$i
         |  ORDER BY sim DESC, vec_id ASC LIMIT $GraphBeam),""".stripMargin
    s"""${graphBuildCtes("vec_id <> 0")}
       |qv AS (SELECT v FROM e WHERE vec_id = 0),
       |qcell AS MATERIALIZED (SELECT cid AS cell FROM cent, qv
       |  ORDER BY list_sum([(qv.v[i] - cent.cv[i]) * (qv.v[i] - cent.cv[i])
       |                     for i in generate_series(1, $Dim)]) ASC,
       |           cid ASC LIMIT 1),
       |v0 AS MATERIALIZED (SELECT c.vec_id,
       |    list_cosine_similarity(c.v, (SELECT v FROM qv)) AS sim
       |  FROM c JOIN rk USING (vec_id) JOIN qcell USING (cell)
       |  WHERE rk.rk = 1),
       |b0 AS MATERIALIZED (SELECT vec_id FROM v0),
       |${(1 to GraphHops).map(hop).mkString("\n")}
       |approx AS (SELECT vec_id FROM v$GraphHops
       |  ORDER BY sim DESC, vec_id ASC LIMIT 10),
       |brute AS (SELECT c.vec_id FROM c, qv
       |  ORDER BY list_cosine_similarity(c.v, qv.v) DESC, c.vec_id ASC
       |  LIMIT 10),
       |ne AS (SELECT count(*) AS n_eval FROM v$GraphHops)
       |SELECT CAST(10 AS BIGINT) AS k,
       |       count(*) AS n_brute,
       |       CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_hits,
       |       round(CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0
       |         END) AS DOUBLE) / 10, 6) AS recall,
       |       (SELECT n_eval FROM ne) AS n_eval
       |FROM brute b LEFT JOIN approx a ON b.vec_id = a.vec_id""".stripMargin
  }

  /** Unrolled oracle for [[annGraphInsert]] — the standing build
    * (shared [[graphBuildCtes]] prefix over the non-batch split),
    * then the MULTI-QUERY beam walk (per-qid windows replace the
    * single-query LIMITs) and the two link stages (out-edge cut,
    * reverse prune), mirroring the Spark row stage for stage. */
  private def annGraphIncrOracle: String = {
    val mod = Dedup.IncrMod
    def hop(i: Int): String =
      s"""f$i AS MATERIALIZED (SELECT DISTINCT b.qid, g.dst AS vec_id
         |  FROM gf g JOIN b${i - 1} b ON g.src = b.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM v${i - 1} v
         |                    WHERE v.qid = b.qid AND v.vec_id = g.dst)),
         |v$i AS MATERIALIZED (SELECT qid, vec_id, sim FROM v${i - 1}
         |  UNION ALL SELECT f.qid, f.vec_id,
         |    list_cosine_similarity(c.v, q.qv) AS sim
         |  FROM f$i f JOIN c ON c.vec_id = f.vec_id
         |             JOIN q ON q.qid = f.qid),
         |b$i AS MATERIALIZED (SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, vec_id ASC) AS rn FROM v$i)
         |  WHERE rn <= $GraphBeam),""".stripMargin
    s"""${graphBuildCtes(s"vec_id % $mod <> 0")}
       |q AS MATERIALIZED (SELECT vec_id AS qid, v AS qv FROM e
       |  WHERE vec_id % $mod = 0),
       |qc AS MATERIALIZED (SELECT qid, cell FROM (
       |    SELECT q.qid, cent.cid AS cell,
       |           row_number() OVER (PARTITION BY q.qid
       |      ORDER BY list_sum([(q.qv[i] - cent.cv[i])
       |                         * (q.qv[i] - cent.cv[i])
       |                         for i in generate_series(1, $Dim)]) ASC,
       |               cent.cid ASC) AS rn
       |    FROM q, cent) WHERE rn = 1),
       |v0 AS MATERIALIZED (SELECT qc.qid, c.vec_id,
       |    list_cosine_similarity(c.v, q.qv) AS sim
       |  FROM qc JOIN rk ON rk.cell = qc.cell AND rk.rk = 1
       |  JOIN c ON c.vec_id = rk.vec_id
       |  JOIN q ON q.qid = qc.qid),
       |b0 AS MATERIALIZED (SELECT qid, vec_id FROM v0),
       |${(1 to GraphHops).map(hop).mkString("\n")}
       |oute AS MATERIALIZED (SELECT qid, vec_id AS d, sim FROM (
       |    SELECT qid, vec_id, sim, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, vec_id ASC) AS rn FROM v$GraphHops)
       |  WHERE rn <= $GraphDeg),
       |nn AS MATERIALIZED (SELECT qid, vec_id AS nn FROM (
       |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, vec_id ASC) AS rn FROM v$GraphHops)
       |  WHERE rn = 1),
       |pin2 AS MATERIALIZED (SELECT qid, vec_id AS pin FROM (
       |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, vec_id ASC) AS rn FROM v$GraphHops)
       |  WHERE rn <= 2),
       |entrye AS MATERIALIZED (SELECT vec_id AS d, qid AS nbr,
       |    sim + 2.0 AS sim FROM v0),
       |tch AS (SELECT d FROM oute UNION SELECT d FROM entrye),
       |exout AS MATERIALIZED (SELECT g.src AS d, g.dst AS nbr,
       |    list_cosine_similarity(ca.v, cb.v) AS sim
       |  FROM gf g JOIN tch ON g.src = tch.d
       |  JOIN c ca ON ca.vec_id = g.src JOIN c cb ON cb.vec_id = g.dst),
       |revnew AS MATERIALIZED (SELECT d, nbr, max(sim) AS sim FROM (
       |    SELECT o.d, o.qid AS nbr,
       |        o.sim + CASE WHEN EXISTS (SELECT 1 FROM pin2 p
       |            WHERE p.qid = o.qid AND p.pin = o.d)
       |          THEN 2.0 ELSE 0.0 END AS sim
       |    FROM oute o
       |    UNION ALL SELECT d, nbr, sim FROM entrye)
       |  GROUP BY d, nbr),
       |revk AS MATERIALIZED (SELECT d, nbr FROM (
       |    SELECT d, nbr, row_number() OVER (PARTITION BY d
       |      ORDER BY sim DESC, nbr ASC) AS rn
       |    FROM (SELECT d, nbr, sim FROM exout
       |          UNION ALL SELECT d, nbr, sim FROM revnew))
       |  WHERE rn <= $GraphDeg),
       |nrev AS (SELECT nbr AS qid, count(*) AS n_rev_kept FROM revk
       |  WHERE nbr % $mod = 0 GROUP BY nbr),
       |nev AS (SELECT qid, count(*) AS n_eval FROM v$GraphHops
       |  GROUP BY qid),
       |nout AS (SELECT qid, count(*) AS n_out FROM oute GROUP BY qid)
       |SELECT q.qid AS vec_id, qc.cell, nev.n_eval, nn.nn, nout.n_out,
       |       coalesce(nrev.n_rev_kept, CAST(0 AS BIGINT)) AS n_rev_kept
       |FROM q JOIN qc USING (qid) JOIN nev USING (qid)
       |JOIN nn USING (qid) JOIN nout USING (qid)
       |LEFT JOIN nrev USING (qid)
       |ORDER BY vec_id ASC""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_ann_graph" -> annGraphOracle,
    "q_ann_graph_incr" -> annGraphIncrOracle,
    "q_ann_sq8" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |g AS (SELECT min(list_min(v)) AS gmin, max(list_max(v)) AS gmax
         |      FROM e),
         |c AS (SELECT vec_id,
         |             [CAST(round(255 * (v[i] - g.gmin) / (g.gmax - g.gmin))
         |                   AS INTEGER)
         |              for i in generate_series(1, $Dim)] AS codes
         |      FROM e, g),
         |qc AS (SELECT codes AS qcodes FROM c WHERE vec_id = 0),
         |approx AS (SELECT vec_id FROM (
         |    SELECT c.vec_id,
         |           list_sum([(c.codes[i] - q.qcodes[i]) *
         |                     (c.codes[i] - q.qcodes[i])
         |                     for i in generate_series(1, $Dim)]) AS d2
         |    FROM c, qc q WHERE c.vec_id <> 0)
         |  ORDER BY d2 ASC, vec_id ASC LIMIT 10),
         |brute AS (SELECT e.vec_id FROM e,
         |            (SELECT v AS qv FROM e WHERE vec_id = 0) q
         |          WHERE e.vec_id <> 0
         |          ORDER BY list_sum([(e.v[i] - q.qv[i]) * (e.v[i] - q.qv[i])
         |                             for i in generate_series(1, $Dim)]) ASC,
         |                   e.vec_id ASC
         |          LIMIT 10)
         |SELECT CAST(10 AS BIGINT) AS k,
         |       count(*) AS n_brute,
         |       CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_hits,
         |       round(CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0
         |         END) AS DOUBLE) / 10, 6) AS recall
         |FROM brute b LEFT JOIN approx a ON b.vec_id = a.vec_id""".stripMargin,
    "q_ann_pq" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s0 AS (SELECT vec_id AS sid, v AS sv FROM e
         |       ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
         |       LIMIT $PqK),
         |sj AS (SELECT row_number() OVER (ORDER BY sid ASC) - 1 AS j, sv
         |       FROM s0),
         |sd AS (SELECT e.vec_id, g.m, s.j,
         |              ${sqlSubdist("e.v", "s.sv", "g.m")} AS d
         |       FROM e, sj s, generate_series(1, $PqM) AS g(m)
         |       WHERE e.vec_id <> 0),
         |codes AS (SELECT vec_id, m, j FROM (
         |            SELECT vec_id, m, j,
         |                   row_number() OVER (PARTITION BY vec_id, m
         |                     ORDER BY d ASC, j ASC) AS rn
         |            FROM sd) WHERE rn = 1),
         |dt AS (SELECT g.m, s.j, ${sqlSubdist("q.v", "s.sv", "g.m")} AS d
         |       FROM (SELECT v FROM e WHERE vec_id = 0) q, sj s,
         |            generate_series(1, $PqM) AS g(m)),
         |est AS (SELECT c.vec_id, list_sum(list(dt.d ORDER BY c.m)) AS est
         |        FROM codes c JOIN dt ON c.m = dt.m AND c.j = dt.j
         |        GROUP BY c.vec_id),
         |pq AS (SELECT vec_id FROM est ORDER BY est ASC, vec_id ASC
         |       LIMIT 10),
         |brute AS (SELECT e.vec_id FROM e,
         |            (SELECT v AS qv FROM e WHERE vec_id = 0) q
         |          WHERE e.vec_id <> 0
         |          ORDER BY list_sum([(e.v[i] - q.qv[i]) * (e.v[i] - q.qv[i])
         |                             for i in generate_series(1, $Dim)]) ASC,
         |                   e.vec_id ASC
         |          LIMIT 10)
         |SELECT CAST(10 AS BIGINT) AS k,
         |       count(*) AS n_brute,
         |       CAST(sum(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_hits,
         |       round(CAST(sum(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0
         |         END) AS DOUBLE) / 10, 6) AS recall
         |FROM brute b LEFT JOIN pq p ON b.vec_id = p.vec_id""".stripMargin,
    "q_ann_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT vec_id, v, $bucketSql AS bucket FROM e WHERE vec_id <> 0),
         |q AS (SELECT v AS qv, $bucketSql AS qb FROM e WHERE vec_id = 0),
         |probes AS (SELECT qv, unnest($probeXors) AS bucket FROM q),
         |approx AS (
         |  SELECT vec_id FROM (
         |    SELECT c.vec_id, list_cosine_similarity(c.v, p.qv) AS sim
         |    FROM c JOIN probes p ON c.bucket = p.bucket)
         |  ORDER BY sim DESC, vec_id ASC LIMIT 10),
         |brute AS (
         |  SELECT e.vec_id,
         |         list_cosine_similarity(e.v, (SELECT qv FROM q)) AS sim
         |  FROM e WHERE vec_id <> 0
         |  ORDER BY sim DESC, vec_id ASC LIMIT 10)
         |SELECT CAST(10 AS BIGINT) AS k,
         |       count(*) AS n_brute,
         |       CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_hits,
         |       round(CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0
         |         END) AS DOUBLE) / 10, 6) AS recall
         |FROM brute b LEFT JOIN approx a ON b.vec_id = a.vec_id""".stripMargin,
    "q_ann_knn_join" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT vec_id, v, $bucketSql AS bucket FROM e
         |      WHERE vec_id >= 10),
         |q AS (SELECT vec_id AS qid, v AS qv, $bucketSql AS qb FROM e
         |      WHERE vec_id < 10),
         |p AS (SELECT qid, qv, unnest($probeXors) AS bucket FROM q),
         |cand AS (SELECT p.qid, c.vec_id,
         |                list_cosine_similarity(c.v, p.qv) AS sim
         |         FROM c JOIN p USING (bucket)),
         |r AS (SELECT qid, vec_id, sim,
         |             row_number() OVER (PARTITION BY qid
         |               ORDER BY sim DESC, vec_id ASC) AS rnk
         |      FROM cand)
         |SELECT qid, vec_id, round(sim, 6) AS sim, CAST(rnk AS INT) AS rnk
         |FROM r WHERE rnk <= 5 ORDER BY qid ASC, rnk ASC""".stripMargin,
    "q_ann_lsh_bucket" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT vec_id, v, $bucketSql AS bucket FROM e WHERE vec_id <> 0),
         |q AS (SELECT v AS qv, $bucketSql AS qb FROM e WHERE vec_id = 0),
         |probes AS (SELECT qv, unnest($probeXors) AS bucket FROM q),
         |cand AS (SELECT c.vec_id, c.bucket,
         |                list_cosine_similarity(c.v, p.qv) AS sim
         |         FROM c JOIN probes p ON c.bucket = p.bucket)
         |SELECT vec_id, bucket, round(sim, 6) AS sim FROM cand
         |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "q_ann_ivf" -> ivfOracle(""),
    "q_ann_filtered" -> ivfOracle(s" AND e.label = $FilterLabel"),
    "q_ann_ivfpq" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |seeds AS (SELECT vec_id AS sid, v AS sv FROM e
         |          ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
         |          LIMIT $IvfCells),
         |d0 AS (SELECT e.vec_id, s.sid,
         |              list_sum([(e.v[i] - s.sv[i]) * (e.v[i] - s.sv[i])
         |                        for i in generate_series(1, $Dim)]) AS d
         |       FROM e, seeds s),
         |a0 AS (SELECT vec_id, sid AS cid FROM (
         |         SELECT vec_id, sid,
         |                row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY d ASC, sid ASC) AS rn
         |         FROM d0) WHERE rn = 1),
         |dims AS (SELECT a0.cid, g.i AS pos,
         |                CAST(round(e.v[g.i] * 1e6) AS BIGINT) AS m
         |         FROM a0 JOIN e USING (vec_id),
         |              generate_series(1, $Dim) AS g(i)),
         |cdim AS (SELECT cid, pos, CAST(sum(m) AS DOUBLE) / count(*) / 1e6 AS c
         |         FROM dims GROUP BY cid, pos),
         |cent AS (SELECT cid, list(c ORDER BY pos) AS cv
         |         FROM cdim GROUP BY cid),
         |d1 AS (SELECT e.vec_id, t.cid,
         |              list_sum([(e.v[i] - t.cv[i]) * (e.v[i] - t.cv[i])
         |                        for i in generate_series(1, $Dim)]) AS d
         |       FROM e, cent t),
         |a1 AS (SELECT vec_id, cid AS cell FROM (
         |         SELECT vec_id, cid,
         |                row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY d ASC, cid ASC) AS rn
         |         FROM d1) WHERE rn = 1),
         |qc AS (SELECT t.cid AS cell
         |       FROM cent t, (SELECT v FROM e WHERE vec_id = 0) q
         |       ORDER BY list_sum([(q.v[i] - t.cv[i]) * (q.v[i] - t.cv[i])
         |                          for i in generate_series(1, $Dim)]) ASC,
         |                t.cid ASC
         |       LIMIT $NProbe),
         |cand AS (SELECT a1.vec_id FROM a1 JOIN qc USING (cell)
         |         WHERE a1.vec_id <> 0),
         |s0 AS (SELECT vec_id AS sid, v AS sv FROM e
         |       ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
         |       LIMIT $PqK),
         |sj AS (SELECT row_number() OVER (ORDER BY sid ASC) - 1 AS j, sv
         |       FROM s0),
         |sd AS (SELECT e.vec_id, g.m, s.j,
         |              ${sqlSubdist("e.v", "s.sv", "g.m")} AS d
         |       FROM e JOIN cand USING (vec_id), sj s,
         |            generate_series(1, $PqM) AS g(m)),
         |codes AS (SELECT vec_id, m, j FROM (
         |            SELECT vec_id, m, j,
         |                   row_number() OVER (PARTITION BY vec_id, m
         |                     ORDER BY d ASC, j ASC) AS rn
         |            FROM sd) WHERE rn = 1),
         |dt AS (SELECT g.m, s.j, ${sqlSubdist("q.v", "s.sv", "g.m")} AS d
         |       FROM (SELECT v FROM e WHERE vec_id = 0) q, sj s,
         |            generate_series(1, $PqM) AS g(m)),
         |est AS (SELECT c.vec_id, list_sum(list(dt.d ORDER BY c.m)) AS est
         |        FROM codes c JOIN dt ON c.m = dt.m AND c.j = dt.j
         |        GROUP BY c.vec_id),
         |short AS (SELECT vec_id FROM est ORDER BY est ASC, vec_id ASC
         |          LIMIT $RefineR),
         |rr AS (SELECT e.vec_id,
         |              list_cosine_similarity(e.v,
         |                (SELECT v FROM e WHERE vec_id = 0)) AS sim
         |       FROM e JOIN short USING (vec_id))
         |SELECT vec_id, round(sim, 6) AS sim FROM rr
         |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    // Semantic hard negatives: IVF-probed candidates minus embedding
    // band-bucket mates of the query (Dedup.embCodedCte/embBandsCte,
    // so "positive" is exactly q_dedup_embedding's candidate rule).
    "q_hard_negatives_vec" -> {
      val qids = VecNegQueries.mkString(", ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |seeds AS (SELECT vec_id AS sid, v AS sv FROM e
         |          ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
         |          LIMIT $IvfCells),
         |d0 AS (SELECT e.vec_id, s.sid,
         |              list_sum([(e.v[i] - s.sv[i]) * (e.v[i] - s.sv[i])
         |                        for i in generate_series(1, $Dim)]) AS d
         |       FROM e, seeds s),
         |a0 AS (SELECT vec_id, sid AS cid FROM (
         |         SELECT vec_id, sid,
         |                row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY d ASC, sid ASC) AS rn
         |         FROM d0) WHERE rn = 1),
         |dims AS (SELECT a0.cid, g.i AS pos,
         |                CAST(round(e.v[g.i] * 1e6) AS BIGINT) AS m
         |         FROM a0 JOIN e USING (vec_id),
         |              generate_series(1, $Dim) AS g(i)),
         |cdim AS (SELECT cid, pos, CAST(sum(m) AS DOUBLE) / count(*) / 1e6 AS c
         |         FROM dims GROUP BY cid, pos),
         |cent AS (SELECT cid, list(c ORDER BY pos) AS cv
         |         FROM cdim GROUP BY cid),
         |d1 AS (SELECT e.vec_id, t.cid,
         |              list_sum([(e.v[i] - t.cv[i]) * (e.v[i] - t.cv[i])
         |                        for i in generate_series(1, $Dim)]) AS d
         |       FROM e, cent t),
         |a1 AS (SELECT vec_id, cid AS cell FROM (
         |         SELECT vec_id, cid,
         |                row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY d ASC, cid ASC) AS rn
         |         FROM d1) WHERE rn = 1),
         |qs AS (SELECT vec_id AS qid, v AS qv FROM e
         |       WHERE vec_id IN ($qids)),
         |qdist AS (SELECT qs.qid, qs.qv, t.cid AS cell,
         |                 list_sum([(qs.qv[i] - t.cv[i]) *
         |                           (qs.qv[i] - t.cv[i])
         |                           for i in generate_series(1, $Dim)]) AS qd
         |          FROM qs, cent t),
         |qc AS (SELECT qid, qv, cell FROM (
         |         SELECT qid, qv, cell,
         |                row_number() OVER (PARTITION BY qid
         |                  ORDER BY qd ASC, cell ASC) AS rn
         |         FROM qdist) WHERE rn <= $NProbe),
         |cand AS (SELECT qc.qid, a1.vec_id,
         |                list_cosine_similarity(e.v, qc.qv) AS sim
         |         FROM a1 JOIN qc USING (cell) JOIN e USING (vec_id)
         |         WHERE a1.vec_id <> qc.qid),
         |${Dedup.embCodedCte},
         |${Dedup.embBandsCte},
         |qb AS (SELECT vec_id AS qid, bk FROM bands
         |       WHERE vec_id IN ($qids)),
         |pos AS (SELECT DISTINCT qb.qid, b.vec_id
         |        FROM bands b JOIN qb USING (bk)),
         |neg AS (SELECT c2.qid, c2.vec_id, c2.sim FROM cand c2
         |        LEFT JOIN pos ON pos.qid = c2.qid
         |          AND pos.vec_id = c2.vec_id
         |        WHERE pos.vec_id IS NULL),
         |r AS (SELECT qid, vec_id, sim,
         |             CAST(row_number() OVER (PARTITION BY qid
         |               ORDER BY sim DESC, vec_id ASC) AS INTEGER) AS rank
         |      FROM neg)
         |SELECT qid, rank, vec_id, round(sim, 6) AS sim
         |FROM r WHERE rank <= $VecNegK
         |ORDER BY qid ASC, rank ASC""".stripMargin
    },
    // Residual IVFPQ + one Lloyd codebook step (q_ann_ivfpq_res):
    // every stage of the FAISS-default serving configuration,
    // mirrored CTE for CTE — cell assignment, per-cell residuals,
    // residual-seeded codebook, micro-unit Lloyd means with seed
    // fallback, per-subspace argmin encode, per-probed-cell ADC
    // tables, RefineR exact refine.
    "q_ann_ivfpq_res" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |seeds AS (SELECT vec_id AS sid, v AS sv FROM e
         |          ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
         |          LIMIT $IvfCells),
         |d0 AS (SELECT e.vec_id, s.sid,
         |              list_sum([(e.v[i] - s.sv[i]) * (e.v[i] - s.sv[i])
         |                        for i in generate_series(1, $Dim)]) AS d
         |       FROM e, seeds s),
         |a0 AS (SELECT vec_id, sid AS cid FROM (
         |         SELECT vec_id, sid,
         |                row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY d ASC, sid ASC) AS rn
         |         FROM d0) WHERE rn = 1),
         |dims AS (SELECT a0.cid, g.i AS pos,
         |                CAST(round(e.v[g.i] * 1e6) AS BIGINT) AS m
         |         FROM a0 JOIN e USING (vec_id),
         |              generate_series(1, $Dim) AS g(i)),
         |cdim AS (SELECT cid, pos, CAST(sum(m) AS DOUBLE) / count(*) / 1e6 AS c
         |         FROM dims GROUP BY cid, pos),
         |cent AS (SELECT cid, list(c ORDER BY pos) AS cv
         |         FROM cdim GROUP BY cid),
         |d1 AS (SELECT e.vec_id, t.cid,
         |              list_sum([(e.v[i] - t.cv[i]) * (e.v[i] - t.cv[i])
         |                        for i in generate_series(1, $Dim)]) AS d
         |       FROM e, cent t),
         |a1 AS (SELECT vec_id, cid AS cell FROM (
         |         SELECT vec_id, cid,
         |                row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY d ASC, cid ASC) AS rn
         |         FROM d1) WHERE rn = 1),
         |resid AS (SELECT a1.vec_id, a1.cell,
         |                 [e.v[i] - t.cv[i]
         |                  for i in generate_series(1, $Dim)] AS rv
         |          FROM a1 JOIN e USING (vec_id)
         |               JOIN cent t ON t.cid = a1.cell),
         |s0 AS (SELECT vec_id AS sid, rv AS sv FROM resid
         |       ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
         |       LIMIT $PqK),
         |sj AS (SELECT row_number() OVER (ORDER BY sid ASC) - 1 AS j, sv
         |       FROM s0),
         |sd0 AS (SELECT r.vec_id, g.m, s.j,
         |               ${sqlSubdist("r.rv", "s.sv", "g.m")} AS d
         |        FROM resid r, sj s, generate_series(1, $PqM) AS g(m)),
         |codes0 AS (SELECT vec_id, m, j FROM (
         |             SELECT vec_id, m, j,
         |                    row_number() OVER (PARTITION BY vec_id, m
         |                      ORDER BY d ASC, j ASC) AS rn
         |             FROM sd0) WHERE rn = 1),
         |rdims AS (SELECT c0.m, c0.j, g.i AS pos,
         |                 CAST(round(r.rv[(c0.m-1)*$PqSub + g.i] * 1e6)
         |                   AS BIGINT) AS mi
         |          FROM codes0 c0 JOIN resid r USING (vec_id),
         |               generate_series(1, $PqSub) AS g(i)),
         |cmean AS (SELECT m, j, pos,
         |                 CAST(sum(mi) AS DOUBLE) / count(*) / 1e6 AS c
         |          FROM rdims GROUP BY m, j, pos),
         |sslice AS (SELECT g.m, s.j, i.i AS pos,
         |                  s.sv[(g.m-1)*$PqSub + i.i] AS c
         |           FROM sj s, generate_series(1, $PqM) AS g(m),
         |                generate_series(1, $PqSub) AS i(i)),
         |cb1 AS (SELECT ss.j,
         |               list(COALESCE(cm.c, ss.c)
         |                    ORDER BY ss.m ASC, ss.pos ASC) AS sv
         |        FROM sslice ss LEFT JOIN cmean cm
         |          ON cm.m = ss.m AND cm.j = ss.j AND cm.pos = ss.pos
         |        GROUP BY ss.j),
         |qc AS (SELECT t.cid AS cell, t.cv
         |       FROM cent t, (SELECT v FROM e WHERE vec_id = 0) q
         |       ORDER BY list_sum([(q.v[i] - t.cv[i]) * (q.v[i] - t.cv[i])
         |                          for i in generate_series(1, $Dim)]) ASC,
         |                t.cid ASC
         |       LIMIT $NProbe),
         |qrc AS (SELECT qc.cell,
         |               [q.v[i] - qc.cv[i]
         |                for i in generate_series(1, $Dim)] AS qrv
         |        FROM qc, (SELECT v FROM e WHERE vec_id = 0) q),
         |dt AS (SELECT qrc.cell, g.m, c.j,
         |              ${sqlSubdist("qrc.qrv", "c.sv", "g.m")} AS d
         |       FROM qrc, cb1 c, generate_series(1, $PqM) AS g(m)),
         |cand AS (SELECT r.vec_id, r.cell, r.rv FROM resid r
         |         JOIN qc ON qc.cell = r.cell
         |         WHERE r.vec_id <> 0),
         |sd1 AS (SELECT r.vec_id, r.cell, g.m, c.j,
         |               ${sqlSubdist("r.rv", "c.sv", "g.m")} AS d
         |        FROM cand r, cb1 c, generate_series(1, $PqM) AS g(m)),
         |codes1 AS (SELECT vec_id, cell, m, j FROM (
         |             SELECT vec_id, cell, m, j,
         |                    row_number() OVER (PARTITION BY vec_id, m
         |                      ORDER BY d ASC, j ASC) AS rn
         |             FROM sd1) WHERE rn = 1),
         |est AS (SELECT c1.vec_id, list_sum(list(dt.d ORDER BY c1.m)) AS est
         |        FROM codes1 c1 JOIN dt ON dt.cell = c1.cell
         |          AND dt.m = c1.m AND dt.j = c1.j
         |        GROUP BY c1.vec_id),
         |short AS (SELECT vec_id FROM est ORDER BY est ASC, vec_id ASC
         |          LIMIT $RefineR),
         |rr AS (SELECT e.vec_id,
         |              list_cosine_similarity(e.v,
         |                (SELECT v FROM e WHERE vec_id = 0)) AS sim
         |       FROM e JOIN short USING (vec_id))
         |SELECT vec_id, round(sim, 6) AS sim FROM rr
         |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "q_ann_incremental" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |corp AS (SELECT * FROM e WHERE vec_id % ${Dedup.IncrMod} <> 0),
         |bat AS (SELECT * FROM e WHERE vec_id % ${Dedup.IncrMod} = 0),
         |seeds AS (SELECT vec_id AS sid, v AS sv FROM corp
         |          ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
         |          LIMIT $IvfCells),
         |d0 AS (SELECT corp.vec_id, s.sid,
         |              list_sum([(corp.v[i] - s.sv[i]) * (corp.v[i] - s.sv[i])
         |                        for i in generate_series(1, $Dim)]) AS d
         |       FROM corp, seeds s),
         |a0 AS (SELECT vec_id, sid AS cid FROM (
         |         SELECT vec_id, sid,
         |                row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY d ASC, sid ASC) AS rn
         |         FROM d0) WHERE rn = 1),
         |dims AS (SELECT a0.cid, g.i AS pos,
         |                CAST(round(corp.v[g.i] * 1e6) AS BIGINT) AS m
         |         FROM a0 JOIN corp USING (vec_id),
         |              generate_series(1, $Dim) AS g(i)),
         |cdim AS (SELECT cid, pos, CAST(sum(m) AS DOUBLE) / count(*) / 1e6 AS c
         |         FROM dims GROUP BY cid, pos),
         |cent AS (SELECT cid, list(c ORDER BY pos) AS cv
         |         FROM cdim GROUP BY cid),
         |dc AS (SELECT corp.vec_id, t.cid,
         |              list_sum([(corp.v[i] - t.cv[i]) * (corp.v[i] - t.cv[i])
         |                        for i in generate_series(1, $Dim)]) AS d
         |       FROM corp, cent t),
         |ac AS (SELECT vec_id, cid AS cell FROM (
         |         SELECT vec_id, cid,
         |                row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY d ASC, cid ASC) AS rn
         |         FROM dc) WHERE rn = 1),
         |db AS (SELECT bat.vec_id, t.cid,
         |              list_sum([(bat.v[i] - t.cv[i]) * (bat.v[i] - t.cv[i])
         |                        for i in generate_series(1, $Dim)]) AS d
         |       FROM bat, cent t),
         |ab AS (SELECT vec_id, cid AS cell, d FROM (
         |         SELECT vec_id, cid, d,
         |                row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY d ASC, cid ASC) AS rn
         |         FROM db) WHERE rn = 1),
         |nc AS (SELECT cell, count(*) AS n_corpus FROM ac GROUP BY cell),
         |nb AS (SELECT cell, count(*) AS n_batch,
         |              sum(CAST(round(d * 1e6) AS BIGINT)) AS sd
         |       FROM ab GROUP BY cell)
         |SELECT t.cid AS cell,
         |       CAST(coalesce(nc.n_corpus, 0) AS BIGINT) AS n_corpus,
         |       CAST(coalesce(nb.n_batch, 0) AS BIGINT) AS n_batch,
         |       CAST(coalesce(nc.n_corpus, 0) + coalesce(nb.n_batch, 0)
         |            AS BIGINT) AS n_total,
         |       CASE WHEN nb.n_batch IS NOT NULL
         |            THEN round(CAST(nb.sd AS DOUBLE) / nb.n_batch / 1e6, 6)
         |            ELSE 0.0 END AS mean_d2
         |FROM cent t LEFT JOIN nc ON t.cid = nc.cell
         |            LEFT JOIN nb ON t.cid = nb.cell
         |ORDER BY cell ASC""".stripMargin,
    "q_kmeans" -> kmeansOracle,
  )
}
