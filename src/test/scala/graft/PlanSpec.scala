package graft

import org.apache.spark.sql.DataFrame

import graft.operators._

/** Explain-plan audits: the scale properties SURVEY §4 promises must
  * be visible in the physical plan, not just claimed in doc comments.
  * (These assert on plan STRUCTURE — pushdown, pruning, join/ranking
  * strategy — which is what survives a 100× scale-up.) */
class PlanSpec extends SparkSuite {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String = {
    import org.apache.spark.sql.execution.debug._ // noop import guard
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("registry sweep: NO query outputs a non-scalar column") {
    // The driver's pandas comparator cannot sort array/map/struct
    // cells (`unhashable type: numpy.ndarray` — r7's q_glossary_refs
    // passed the local gate and died at the driver). Verify rejects
    // such outputs at run time; this sweep catches the class at test
    // time for every present and future row. Schema needs analysis
    // only; stream rows are excluded (building one runs its whole
    // micro-batch pipeline) — their sinks roll up to scalars anyway.
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("q_stream_"))
      .flatMap { name =>
        val bad = Verify.complexCols(
          SparkEntry.queries(name)(spark, sfDir).schema)
        if (bad.nonEmpty) Some(s"$name(${bad.mkString(";")})") else None
      }
    assert(offenders.isEmpty,
      s"queries with array/map/struct output columns: $offenders")
    // And the guard itself flags a synthetic array output.
    import org.apache.spark.sql.functions._
    val synthetic = spark.range(1)
      .select(col("id"), array(lit("a"), lit("b")).as("xs"))
    assert(Verify.complexCols(synthetic.schema).nonEmpty)
  }

  test("registry sweep: NO query plans a CartesianProduct") {
    // The one plan shape that can never survive 100 TB. Individual
    // audits pin specific queries; this sweep pins the INVARIANT for
    // every present and future registry row. Tiny broadcast sides
    // plan as BroadcastNestedLoopJoin — allowed; an unhinted
    // CartesianProduct is always a bug. Stream rows are excluded
    // (building them runs a micro-batch pipeline; their stream-side
    // plans are audited in StreamingSpec).
    val skip = (n: String) => n.startsWith("q_stream_")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(skip)
      .flatMap { name =>
        val p = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"queries planning a cartesian product: $offenders")
  }

  test("registry sweep: every query is run-to-run deterministic " +
      "(two executions hash equal)") {
    // The single-run DuckDB gate proves a result is RIGHT; this sweep
    // proves it is STABLE — a tie broken by partition arrival order,
    // an un-ordered limit, or a rand() sneaking in produces a result
    // that can pass the gate one run and fail it the next. Every
    // non-stream row executes twice and the canonicalized results
    // (toJSON: schema-ordered fields, base64 binary, row-sorted) must
    // be byte-equal. Stream rows are excluded: each build runs a
    // micro-batch pipeline, and their determinism is already pinned
    // by the stream==batch twin specs plus this sweep on the batch
    // side.
    val skip = (n: String) => n.startsWith("q_stream_")
    def canon(name: String): String =
      SparkEntry.queries(name)(spark, sfDir)
        .toJSON.collect().sorted.mkString("\n")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(skip)
      .flatMap { name =>
        if (canon(name) == canon(name)) None else Some(name)
      }
    assert(offenders.isEmpty,
      s"queries with run-to-run nondeterminism: $offenders")
  }

  test("registry sweep: interpreted execution matches codegen " +
      "(whole registry, codegen off == on)") {
    // The kernel specs pin each native Expression's eval/doGenCode
    // parity in isolation; this sweep pins the INVARIANT for every
    // registry row in composition — a future kernel whose
    // interpreted path drifts from its generated code (or a builtin
    // used outside its codegen envelope) fails here by name, not as
    // a mysterious gate mismatch on a fallback-mode cluster (Spark
    // silently drops to interpreted eval when generated code fails
    // to compile, so the interpreted path IS a production path).
    val skip = (n: String) => n.startsWith("q_stream_")
    def canon(name: String): String =
      SparkEntry.queries(name)(spark, sfDir)
        .toJSON.collect().sorted.mkString("\n")
    val names = SparkEntry.queries.keys.toSeq.sorted.filterNot(skip)
    val on = names.map(n => n -> canon(n)).toMap
    val offenders = withCodegenOff {
      names.filter(n => canon(n) != on(n))
    }
    assert(offenders.isEmpty,
      s"queries whose interpreted result drifts from codegen: $offenders")
  }

  test("q_vec_topk: filter pushed to parquet scan, TakeOrderedAndProject top-k") {
    val p = formatted(VectorSearch.topK(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      s"expected partition-local top-k heap, got:\n$p")
    assert(p.contains("PushedFilters") && p.contains("EqualTo(vec_id,0)"),
      s"expected vec_id pushdown, got:\n$p")
  }

  test("q_vec_dim_audit: exact driver-side recomputation; " +
      "map-side-combined single agg") {
    val got = VectorSearch.dimAudit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("cast(embedding as array<double>)").collect()
      .map(_.getSeq[Double](0).toArray)
    val dims = vecs.map(_.length).max
    val want = (0 until dims).map { d =>
      val ms = vecs.filter(_.length > d)
        .map(v => BigDecimal(v(d) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      val n = ms.length.toLong
      val s = ms.sum
      val ssq = ms.map(m => BigInt(m) * m).sum
      (d.toLong, n, s, ((BigInt(n) * ssq - BigInt(s) * s) / (BigInt(n) * n)).toLong,
        ms.min, ms.max)
    }
    assert(got.toSeq === want)
    // No dead dimension in healthy testdata; audit would catch one.
    assert(got.forall(_._4 > 0L))
    // Plan: one exchange total (the dim-key agg); explode is map-side.
    val p = plan(VectorSearch.dimAudit(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one shuffle, got:\n$p")
  }

  test("q_vec_knn_join: bounded top-k agg, no Window, query side broadcast") {
    val p = plan(VectorSearch.knnJoin(spark, sfDir))
    assert(!p.contains("Window"),
      "kNN ranking must not use a window over low-cardinality qid")
    assert(p.contains("top_k_by_score"), "expected bounded top-k aggregate")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "query batch must broadcast")
  }

  test("q_events_bucket: unused wide column pruned from scan") {
    val p = formatted(Relational.eventsBucket(spark, sfDir))
    assert(!p.contains("props"),
      s"events.props must be pruned from ReadSchema, got:\n$p")
  }

  test("q1_pricing: shipdate filter pushed down; partial aggregation present") {
    val p = formatted(Relational.q1Pricing(spark, sfDir))
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      s"expected l_shipdate pushdown, got:\n$p")
    assert(p.contains("HashAggregate"), "expected hash aggregation")
  }

  test("q_join_agg: dimension joins broadcast") {
    val p = plan(Relational.joinAgg(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast-join")
  }

  test("dedup candidate joins are equi-joins (no cartesian/all-pairs)") {
    for ((name, df) <- Seq(
        "minhash" -> Dedup.minhashLsh(spark, sfDir),
        "ngram" -> Dedup.ngramJaccard(spark, sfDir),
        "simhash" -> Dedup.simhashPairs(spark, sfDir),
        "embedding" -> Dedup.embeddingNearDup(spark, sfDir))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"),
        s"$name: pair generation must be an equi-join on band keys")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin"),
        s"$name: expected a hash/merge equi-join for candidates")
    }
  }

  test("ANN probes are equi-joins on bucket/cell, corpus never cross-joined") {
    val lsh = plan(Ann.lshBucketSearch(spark, sfDir))
    assert(!lsh.contains("CartesianProduct"))
    val ivf = plan(Ann.ivfSearch(spark, sfDir))
    assert(!ivf.contains("CartesianProduct"))
    // The only nested-loop joins allowed are broadcasts of tiny sides
    // (query vector / centroid set).
    assert(!lsh.contains("SortMergeJoin") || lsh.contains("bucket"),
      "LSH probe should join on the bucket code")
  }

  test("q_vec_filtered: label predicate pushed below the cosine loop") {
    val p = formatted(VectorSearch.topKFiltered(spark, sfDir))
    assert(p.contains("PushedFilters") && p.contains("EqualTo(label,3)"),
      s"label filter must reach the parquet scan:\n$p")
  }

  test("q_meta_range: range + equality predicates pushed to the scan") {
    val p = formatted(Lexical.metaRange(spark, sfDir))
    assert(p.contains("GreaterThanOrEqual(n_chars,400)") &&
      p.contains("LessThanOrEqual(n_chars,450)") &&
      p.contains("EqualTo(lang,en)"),
      s"both predicates must reach the parquet scan:\n$p")
  }

  test("whole-stage codegen covers the cosine hot path") {
    // AQE wraps everything in AdaptiveSparkPlan and defers codegen
    // until execution — turn it off so the codegen explain sees the
    // compiled stages.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = VectorSearch.topK(spark, sfDir)
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(!p.contains("Found 0 WholeStageCodegen"),
        s"hot path must stay codegen'd:\n$p")
      // The native cosine expression sits inside a codegen stage (its
      // doGenCode emitted the fused loop rather than falling back).
      assert(p.contains("cosine_sim"), s"expected native cosine:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q_contamination: benchmark side broadcast, no cartesian") {
    val p = plan(Curation.contamination(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark shingles must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_pack_sequences: one running-sum window partitioned on " +
      "(source, shard), no joins") {
    val df = Curation.packSequences(spark, sfDir)
    val p = plan(df)
    assert(p.split("Window").length - 1 === 1,
      s"expected exactly one window:\n$p")
    assert(!p.contains("Join"), p)
    // The packing window must partition on (source, shard): source
    // alone caps parallelism at n_sources and streams each source
    // through one reducer task.
    val winSpec = p.linesIterator.find(_.contains("windowspecdefinition"))
      .getOrElse(fail(s"no window spec in plan:\n$p"))
    assert(winSpec.contains("source") && winSpec.contains("shard"),
      s"window must partition on (source, shard):\n$winSpec")
  }

  test("q_dedup_latest: rn=1 window rewritten to the bounded aggregate") {
    val p = plan(Dedup.dedupLatest(spark, sfDir))
    assert(!p.contains("Window"), s"window must be rewritten away:\n$p")
    assert(p.contains("top_k_rows"), s"expected bounded aggregate:\n$p")
  }

  test("q_ann_knn_join: bucket equi-join, broadcast probes, bounded ranking, no window") {
    val p = plan(Ann.annKnnJoin(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"probes must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"corpus must never cross-join:\n$p")
    assert(p.contains("top_k_by_score") && !p.contains("Window"),
      s"ranking must be the bounded aggregate:\n$p")
  }

  test("q_set_ops: INTERSECT/EXCEPT plan as semi/anti joins, no cartesian") {
    val p = plan(Relational.setOps(spark, sfDir))
    assert(!p.contains("Cartesian"), s"set ops must not cross-join:\n$p")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      s"expected semi (intersect) and anti (except) joins:\n$p")
  }

  test("q_window_range: frame window partitioned on the unbounded user key") {
    val p = plan(Relational.windowRange(spark, sfDir))
    assert(p.contains("Window"), p)
    assert(p.contains("partitionBy=[user_id") ||
      p.contains("[user_id"), s"window must partition by user_id:\n$p")
  }

  test("q_ann_ivf: Lloyd assignments are map-only (no corpus shuffle into an agg keyed by vec_id)") {
    val p = plan(Ann.ivfSearch(spark, sfDir))
    assert(!p.contains("hashpartitioning(vec_id"),
      s"assignment must not shuffle the corpus on vec_id:\n$p")
    assert(p.contains("nearest_cell"), "expected the fused argmin kernel")
  }

  test("q_ann_filtered: the label predicate reaches the parquet scan; " +
      "probe geometry matches q_ann_ivf") {
    val p = plan(Ann.filteredIvfSearch(spark, sfDir))
    assert("PushedFilters: .*label".r.findFirstIn(p).isDefined,
      s"filter must push into the embeddings scan:\n$p")
    assert(!p.contains("hashpartitioning(vec_id"),
      s"assignment must stay map-only under the filter:\n$p")
    assert(p.contains("nearest_cell"), "expected the fused argmin kernel")
  }

  test("q_ann_pq: encoding never shuffles the corpus (broadcast codebook + ADC table)") {
    val p = plan(Ann.pqRecall(spark, sfDir))
    assert(!p.contains("SortMergeJoin"),
      s"PQ must not sort-merge the corpus:\n$p")
    assert(!p.contains("hashpartitioning(vec_id"),
      s"encoding must not shuffle the corpus on vec_id:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      "ADC top-k must be the partition-local heap")
  }

  test("q_repetition: map-only per-doc stats — no explode, no per-doc shuffle") {
    val p = plan(TextAnalysis.repetition(spark, sfDir))
    assert(!p.contains("Generate"),
      s"per-doc stats must fold map-side, not explode:\n$p")
    assert(!p.contains("hashpartitioning(doc_id"),
      s"nothing may shuffle on doc_id:\n$p")
  }

  test("q_json_filter: map-only JSON containment — no join, no agg, " +
    "filter below the sort") {
    val p = plan(Ingest.jsonFilter(spark, sfDir))
    assert(!p.contains("Join"), s"containment is a pure scan+filter:\n$p")
    assert(!p.contains("HashAggregate"), s"no aggregation expected:\n$p")
    // Exactly one exchange: the output-order sort's range partition.
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected at most the sort exchange:\n$p")
  }

  test("q_forget: both erasure probes broadcast — the corpus never " +
      "shuffles for the delete join") {
    val p = plan(Ingest.forget(spark, sfDir))
    // The two corpus-scale joins (delete-list anti + audit semi) must
    // be broadcast probes. The one permitted SortMergeJoin is the
    // final kept⋈forgotten FULL-OUTER rollup join on the bounded
    // ~20-key source column (full-outer cannot broadcast), which is
    // post-aggregation and O(sources), not O(corpus).
    assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(p).isDefined,
      s"delete-list removal must be a broadcast anti-join:\n$p")
    assert("BroadcastHashJoin .*LeftSemi".r.findFirstIn(p).isDefined,
      s"the audit probe must be a broadcast semi-join:\n$p")
    assert(!"SortMergeJoin .*(LeftAnti|LeftSemi)".r.findFirstIn(p).isDefined,
      s"no corpus-scale shuffled probe allowed:\n$p")
  }

  test("q_skew_audit: bounded TakeOrdered cut, no window, one counts agg") {
    val p = plan(Relational.skewAudit(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      s"hot-key cut must be a bounded heap:\n$p")
    assert(!p.contains("Window"), s"no window expected:\n$p")
  }

  test("q_sample_fixed: exact-K cut plans as a bounded heap, not a " +
      "global sort") {
    val p = plan(Curation.sampleFixed(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      s"fixed-K sample must be a per-partition heap + K-row merge:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"no global sort exchange allowed:\n$p")
  }

  test("q_dedup_recall: both probes broadcast the fixed-rate sample; " +
      "the corpus never sort-merges") {
    // THE pre-hashed set relation dedupRecallOver builds (shared
    // definition — the audit and this spec cannot drift).
    val sets = Dedup.hashedTokenSets(Tables.documents(spark, sfDir))
    // Brute-force truth: corpus scan vs BROADCAST sample sets.
    val pt = plan(Dedup.recallTruth(sets))
    assert(pt.contains("BroadcastNestedLoopJoin"),
      s"truth pass must broadcast the sample sets over the corpus:\n$pt")
    assert(!pt.contains("SortMergeJoin"),
      s"truth pass must never shuffle the corpus:\n$pt")
    // Band-candidate probe: corpus band relation vs broadcast keys.
    val pc = plan(Dedup.recallCand(sets))
    assert(pc.contains("BroadcastHashJoin"),
      s"candidate probe must broadcast the sample band keys:\n$pc")
    assert(!pc.contains("SortMergeJoin [bk"),
      s"the band probe must never shuffle the corpus band relation:\n$pc")
    // The composed audit stitches the checkpointed probes with
    // sample-keyed outer joins — nothing cartesian.
    val p = plan(Dedup.dedupRecall(spark, sfDir))
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q_collocations: counting aggs map-side combine; scoring joins " +
      "are vocab-sized equi-joins") {
    val p = plan(Curation.collocations(spark, sfDir))
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // Two partial counting aggregates (pairs + unigrams) must appear
    // (map-side combine collapses the token stream pre-shuffle).
    assert("partial_count".r.findAllIn(p).size >= 2,
      s"expected map-side combined counting aggs:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be a bounded cut:\n$p")
  }

  test("q_scrub_denylist: one scan, no join, single small-key aggregation") {
    val p = plan(TextAnalysis.scrubDenylist(spark, sfDir))
    assert(!p.contains("Join"), s"scrub is a pure projection + agg:\n$p")
    assert(p.contains("HashAggregate"), "expected hash aggregation")
  }

  test("q_vocab_cov: coverage pass joins the vocab broadcast, never sort-merge") {
    val p = plan(Curation.vocabCoverage(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"vocab must broadcast to the corpus scan:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus must not shuffle for the coverage join:\n$p")
  }

  test("q_hdr_quantile: audit thresholds broadcast back over the corpus") {
    val p = plan(Sketches.hdrQuantile(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"the 15-row threshold table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the audit pass must not shuffle orders:\n$p")
  }

  test("q_merge_upsert: one key-partitioned full-outer join, no " +
      "nested-loop anywhere") {
    val p = plan(Ingest.mergeUpsert(spark, sfDir))
    assert(p.contains("FullOuter"),
      s"the merge classification is a full-outer join on the key:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      s"merge must stay an equi-join at any scale:\n$p")
  }

  test("q_dedup_incremental: equi-join probe shapes only, no windows, " +
      "no nested loops") {
    val p = plan(Dedup.incrementalDedup(spark, sfDir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      s"the index probe is an equi-join on band keys:\n$p")
    assert(!p.contains("Window"),
      s"best-match pick must be aggregates, not a per-doc window:\n$p")
  }

  test("q_vec_multispace: each space search is a bounded TakeOrdered cut") {
    val p = plan(VectorSearch.multiSpace(spark, sfDir))
    // Two corpus-scale rankings (one per space) must both be
    // partition-local top-k heaps, never a global sort of scored
    // vectors; the fusion join runs over two <= k-row lists.
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      s"both space searches must plan TakeOrdered cuts:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"fusing two tiny ranked lists must not shuffle-sort:\n$p")
  }

  test("q_related_expand: expansion joins broadcast, corpus never shuffles") {
    val p = plan(VectorSearch.relatedExpand(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"hit list and ref list must broadcast against documents:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"no corpus-side shuffle join in the expansion:\n$p")
  }

  test("q_bm25_indexed probe: no corpus-scale artifacts — postings read " +
      "is pruned, cut is bounded") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_plan_textidx").toString
    try {
      Retrieval.writeBm25Index(spark, sfDir, out)
      val p = plan(Retrieval.probeBm25Index(spark, out))
      assert(p.contains("TakeOrderedAndProject"),
        s"the probe's final cut must be bounded:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"df slice + stats must broadcast into the postings stream:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"no shuffle join in the probe:\n$p")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out)).deleteRecursively()
    }
  }

  test("q_bpe_pairs: pair count aggregates the vocabulary, bounded cut, " +
      "no join, no window") {
    val p = plan(Curation.bpePairs(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 merge candidates must be a bounded cut:\n$p")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"pair counting is two aggregations, nothing else:\n$p")
  }

  test("q_dsir: the 1024-row ratio table broadcasts; the token stream " +
      "is never shuffle-joined") {
    val p = plan(Curation.dsirWeights(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"the bucket-ratio probe must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no shuffle join anywhere in the scoring pass:\n$p")
  }

  test("q_ingest_all: equi-joins only, keyed on doc_id, no cartesian") {
    val p = plan(graft.operators.Ingest.ingestAll(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"),
      s"the composed ingest pass needs no window:\n$p")
  }

  test("q_ohlc: one aggregate with map-side combine, NO window — " +
      "open/close ride the agg as struct extremes") {
    val p = plan(TimeSeries.ohlc(spark, sfDir))
    assert(!p.contains("Window"),
      s"time-ordered open/close must not need a window:\n$p")
    // Struct extremes plan as SortAggregate (immutable buffer type),
    // still with a partial stage before the one (type, day) exchange
    // — the map-side combine is the scale property.
    assert(p.contains("partial_min(struct") && p.contains("partial_sum"),
      s"expected a map-side partial aggregate:\n$p")
  }

  test("q_concurrency / q_sample_pps: every sweep window is " +
      "segment-keyed; the carry tables broadcast") {
    val pc = plan(TimeSeries.concurrency(spark, sfDir))
    assert(pc.contains("BroadcastHashJoin"),
      s"days-sized carry table must broadcast:\n$pc")
    assert(!pc.contains("CartesianProduct"), pc)
    val ps = plan(Curation.samplePps(spark, sfDir))
    assert(ps.contains("BroadcastHashJoin"),
      s"blocks-sized carry table must broadcast:\n$ps")
  }

  test("q_table_stats: one scan, one Expand-planned distinct-agg " +
      "pass — no per-column re-reads, no join") {
    val df = Relational.tableStats(spark, sfDir)
    val p = plan(df)
    // All N distinct aggregates must fold into ONE pass: a single
    // Expand above a single scan. A plan with one scan per column
    // (or a join reassembling them) re-reads the table N times.
    assert(p.contains("Expand"),
      s"distinct aggs must plan as one Expand pass:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected ONE lineitem scan, got $scans:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"stats must not join:\n$p")
    // Semantics: null accounting and NDV bounds hold against the
    // profiled relation.
    val rows = df.collect()
    assert(rows.length === Relational.StatsCols.size)
    val n = rows.head.getAs[Long]("n_rows")
    rows.foreach { r =>
      assert(r.getAs[Long]("ndv") + r.getAs[Long]("n_null") <= n + 1)
      assert(r.getAs[Long]("n_null") >= 0L)
      // String min/max ordering is only lexicographic for the
      // VARCHAR columns (numeric renders can invert: '9' > '100').
      if (Set("l_returnflag", "l_linestatus")
          .contains(r.getAs[String]("col_name")))
        assert(r.getAs[String]("min_v") <= r.getAs[String]("max_v"))
    }
  }

  test("q_compaction: source-partitioned window (no global sort), " +
      "bins partition the inventory and respect the greedy rule") {
    val df = Relational.compactionPlan(spark, sfDir)
    val p = plan(df)
    // The running sum must be a PARTITIONED window — a
    // single-partition global exchange here serializes planning on
    // the whole inventory.
    assert(p.contains("Window"), p)
    assert(!p.contains("Exchange SinglePartition, "),
      s"global single-partition window in the pack:\n$p")
    val rows = df.collect()
    // Every file lands in exactly one bin: bin file counts sum to
    // the inventory, id spans are disjoint and ordered per source.
    val n = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_files")).sum === n)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("bin"))
      assert(sorted.map(_.getAs[Long]("bin")).toSeq ===
        sorted.indices.map(_.toLong), "bins must be dense from 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_file") < b.getAs[Long]("first_file"))
        case _ =>
      }
      // Greedy rule: a bin only closes once the running offset has
      // passed its boundary — cumulatively, bins 0..b hold at least
      // (b+1)·target bytes for every non-final b (per-bin ≥ target
      // does NOT hold: an overfilled bin eats its successor's span).
      var cum = 0L
      sorted.init.zipWithIndex.foreach { case (r, b) =>
        cum += r.getAs[Long]("tot_bytes")
        assert(cum >= (b + 1) * Relational.CompactTarget,
          s"bin $b closed before its boundary: $r")
      }
    }
  }

  test("q_kmeans: assignment is map-only — no shuffle join reunites " +
      "points with labels; only the centroid agg exchanges") {
    // Plan-audit the per-iteration building block (one assignment
    // pass over a labeled relation): the NearestCell argmin must sit
    // above the scan with a broadcast exchange only — a SortMergeJoin
    // or ShuffledHashJoin here would mean the corpus re-shuffles
    // every Lloyd step.
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val seeds = e
      .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
      .limit(Ann.KmK)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val cents = seeds
      .agg(sort_array(collect_list(struct(col("cid"), col("cvec"))))
        .as("cents"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("cid",
        graft.plans.NearestCell(col("embedding"), col("cents")))
      .drop("cents")
    val p = plan(assigned)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"assignment must not shuffle the corpus:\n$p")
    assert(p.contains("nearest_cell") || p.contains("NearestCell"),
      s"expected the fused argmin kernel:\n$p")
  }

  test("registry sweep: no GLOBAL window over unbounded input") {
    // An unpartitioned Window funnels its whole input through ONE
    // task — the quiet scale-killer the ~120 `WindowExec: No
    // Partition Defined` suite warnings point at. Every one today
    // sits above a bounded relation (a limit cut or a ≤K-key
    // aggregate); this sweep asserts that for every present and
    // FUTURE registered row, so a new global window over a corpus-
    // sized relation fails here by name instead of shipping.
    // Walked on the OPTIMIZED logical plan (post-TopKWindowRewrite,
    // i.e. what actually runs; physical trees hide subtrees behind
    // AdaptiveSparkPlanExec).
    import org.apache.spark.sql.catalyst.plans.logical._
    // Bounded-output subtree: an explicit limit, a global (0-key)
    // aggregate, an aggregate over an already-bounded input
    // (aggregation never increases rows), or a grouped aggregate
    // whose EVERY grouping key is a bounded-domain column — enums/
    // flags/buckets of the testdata schema, plus DIAL-bounded keys
    // ("blk": q_sample_pps' segmented-prefix-sum carry, whose block
    // width is the dial a deployment sets to pin the carry list at
    // ~thousands of rows regardless of corpus size — the SemCells
    // occupancy argument). The ≤K-key argument made explicit and
    // auditable.
    val boundedKeys = Set(
      "source", "lang", "split", "event_type", "label", "cell", "cid",
      "bucket", "band", "tier", "tau_ppm", "stage", "step", "iter",
      "col_name", "kind", "space", "qid", "q", "prio", "fp_mod", "blk",
      "l_returnflag", "l_linestatus", "day", "hour", "week", "cohort")
    def bounded(p: LogicalPlan): Boolean = p match {
      case _: GlobalLimit | _: LocalLimit => true
      case a: Aggregate if a.groupingExpressions.isEmpty => true
      case a: Aggregate =>
        a.groupingExpressions.forall(_.references.forall(r =>
          boundedKeys.contains(r.name.toLowerCase))) || bounded(a.child)
      case _: LocalRelation | _: OneRowRelation => true
      case u: Union => u.children.forall(bounded)
      case j: Join => bounded(j.left) && bounded(j.right)
      // Generate (explode) multiplies rows per input row by a
      // row-local array — bounded input stays bounded (the fan-out
      // is a per-row constant, not corpus-sized).
      case g: Generate => bounded(g.child)
      case other if other.children.size == 1 => bounded(other.children.head)
      case _ => false
    }
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("q_stream_"))
      .flatMap { name =>
        val lp = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.optimizedPlan
        lp.collect {
          case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) =>
            s"$name(${w.simpleString(60)})"
        }
      }
    assert(offenders.isEmpty,
      s"global windows over unbounded input: $offenders")
  }

  test("registry sweep: no UNBOUNDED collect_list/collect_set buffer") {
    // The sibling of the global-window class the sweep above pins:
    // a collect_list whose GROUP is corpus-sized materializes the
    // whole group in ONE aggregation buffer (the final-merge task
    // OOMs at 100 TB even though every executor upstream was fine).
    // r11's q_table_version/q_stream_table snapshot digests shipped
    // exactly this shape — collect_list the entire read-back table
    // under a global (and per-source) group — and slipped past the
    // window sweep because it checks Window, not Aggregate buffers.
    // Rule: an Aggregate carrying a collect_list/collect_set is only
    // allowed when its GROUP SIZE is bounded — grouping keys include
    // at least one high-cardinality column (so each group is a
    // per-entity handful), or the aggregate's input subtree is
    // itself bounded (limit cut / ≤K-key agg below it). Grouping by
    // ONLY bounded-domain keys (or none) over unbounded input means
    // some group holds O(corpus) elements → flagged by name.
    //
    // Four folds are DIAL-bounded rather than plan-visibly bounded
    // and are allowlisted BY OUTPUT ALIAS (a new unbounded collect
    // cannot reuse these names without a reviewer seeing this list):
    //  - "cents": the broadcast centroid fold — input is the stored
    //    K-row centroid table (K = SemCells/KmK ≤ 256), read back
    //    from parquet so the K-limit isn't in this plan's subtree;
    //  - "cb": the PQ codebook fold — ≤ 256 codewords per subspace
    //    by construction of the quantizer;
    //  - "bits": the Bloom tier's collect_set(pos) — a SET over the
    //    bit-position domain, state ≤ filter size M whatever the
    //    input row count;
    //  - "pa": the listwise reranker's per-qid permutation — each
    //    qid's candidate list is the rerank window (≤ dial) cut
    //    upstream of the stored probe, not a corpus group.
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.catalyst.expressions.aggregate.{
      CollectList, CollectSet}
    val boundedKeys = Set(
      "source", "lang", "split", "event_type", "label", "cell", "cid",
      "bucket", "band", "tier", "tau_ppm", "stage", "step", "iter",
      "col_name", "kind", "space", "qid", "q", "prio", "fp_mod", "blk",
      "l_returnflag", "l_linestatus", "day", "hour", "week", "cohort")
    def bounded(p: LogicalPlan): Boolean = p match {
      case _: GlobalLimit | _: LocalLimit => true
      case a: Aggregate if a.groupingExpressions.isEmpty => true
      case a: Aggregate =>
        a.groupingExpressions.forall(_.references.forall(r =>
          boundedKeys.contains(r.name.toLowerCase))) || bounded(a.child)
      case _: LocalRelation | _: OneRowRelation => true
      case u: Union => u.children.forall(bounded)
      case j: Join => bounded(j.left) && bounded(j.right)
      case g: Generate => bounded(g.child)
      case other if other.children.size == 1 => bounded(other.children.head)
      case _ => false
    }
    val dialBoundedAliases = Set("cents", "cb", "bits", "pa")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("q_stream_"))
      .flatMap { name =>
        val lp = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.optimizedPlan
        lp.collect {
          case a: Aggregate if a.aggregateExpressions.exists(ne =>
                !dialBoundedAliases.contains(ne.name.toLowerCase) &&
                ne.exists {
                  case _: CollectList | _: CollectSet => true
                  case _ => false
                }) &&
              a.groupingExpressions.forall(_.references.forall(r =>
                boundedKeys.contains(r.name.toLowerCase))) &&
              !bounded(a.child) =>
            s"$name(${a.simpleString(60)})"
        }
      }
    assert(offenders.isEmpty,
      s"corpus-scale collect_list/collect_set buffers: $offenders")
  }
}
