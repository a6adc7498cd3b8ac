package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Invariants of the BM25 / hybrid retrieval tier: score monotonicity
  * in matched-term mass, idf discrimination of rare terms, hybrid
  * blend bounds, and plan shape (filter-before-aggregate — the
  * property that keeps BM25 shuffle volume O(matching docs)).
  */
class RetrievalSpec extends SparkSuite {

  test("bm25 ranks by descending score with doc_id tiebreak") {
    val rows = Retrieval.bm25(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty && rows.length <= 15)
    rows.sliding(2).foreach {
      case Array((id1, _, s1), (id2, _, s2)) =>
        assert(s1 > s2 || (s1 == s2 && id1 < id2),
          s"order violated: ($id1,$s1) before ($id2,$s2)")
      case _ =>
    }
    // Every hit matched at least one of the 4 query terms; scores
    // are positive (the +1 idf form can't go negative).
    rows.foreach { case (_, nTerms, score) =>
      assert(nTerms >= 1 && nTerms <= Retrieval.QueryTerms.length)
      assert(score > 0.0)
    }
  }

  test("bm25 favors the rare query term: top hit contains 'dup'") {
    // 'dup' appears in ~5% of docs → its idf dwarfs the common
    // terms'; every top-15 hit should contain it at sf0.001's
    // 50-doc corpus scale only if present at all — assert the #1
    // doc does contain 'dup' (idf discrimination working).
    val top = Retrieval.bm25(spark, sfDir).limit(1).collect()(0).getLong(0)
    val txt = Tables.documents(spark, sfDir)
      .where(col("doc_id") === top).select(col("text"))
      .collect()(0).getString(0)
    assert(txt.split(" ").contains("dup"),
      s"top bm25 hit $top lacks the rare term 'dup'")
  }

  test("hybrid blend is bounded and ranked; norms in [0,1]") {
    val rows = Retrieval.hybrid(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { case (id, ln_, vn, h) =>
      assert(ln_ >= 0.0 && ln_ <= 1.0, s"lex_norm out of range for $id")
      assert(vn >= 0.0 && vn <= 1.0, s"vec_norm out of range for $id")
      assert(math.abs(h - (0.6 * ln_ + 0.4 * vn)) < 2e-6,
        s"blend mismatch for $id")
    }
    rows.sliding(2).foreach {
      case Array((id1, _, _, h1), (id2, _, _, h2)) =>
        assert(h1 > h2 || (h1 == h2 && id1 < id2))
      case _ =>
    }
  }

  test("bm25 scales: 200k synthetic docs, zero storage, bounded cut") {
    // The zero-storage scale smoke: the graft-synth connector
    // generates 200k documents across 16 planned partitions; BM25
    // must stream them through the filtered tf aggregate and a
    // bounded TakeOrdered cut — no corpus-wide sort, no collect.
    val docs = spark.read.format("graft-synth")
      .option("rows", 200000).option("parts", 16).option("seed", 7)
      .load()
    val top = graft.operators.Retrieval.bm25ScoredOver(docs)
      .orderBy(col("su").desc, col("doc_id").asc).limit(15)
      .collect()
    assert(top.length === 15)
    // Descending integer-unit scores, ids in range.
    top.map(_.getLong(2)).sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
    assert(top.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 200000))
  }

  test("bm25 batch scales: 2M synthetic docs, one shared pass, " +
      "bounded per-query cuts, zero storage") {
    // The mining shape at 2M docs: a 6-query batch rides ONE
    // term-filtered corpus pass (tf/df shared across queries), and
    // each query's cut is the bounded top-k aggregate. A per-query-
    // scan implementation would cost 6 corpus passes here and 10k
    // passes in a real mining batch.
    val docs = spark.read.format("graft-synth")
      .option("rows", 2000000).option("parts", 32).option("seed", 13)
      .load()
    val qs = Seq(0 -> Seq("scan", "merge"), 1 -> Seq("hash", "filter"),
      2 -> Seq("join", "window"), 3 -> Seq("sort", "stream"),
      4 -> Seq("batch", "slow"), 5 -> Seq("merge", "filter", "sort"))
    val out = graft.operators.Retrieval.bm25BatchOver(docs, qs).collect()
    val byQ = out.groupBy(_.getInt(0))
    assert(byQ.keySet === qs.map(_._1).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to rs.length),
        s"qid $q ranks must be dense from 1")
      assert(rs.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 2000000))
    }
  }

  test("eval scales: nDCG/MRR over 2M synthetic docs ride the same " +
      "shared pool pass, zero storage") {
    // Evaluation must stay O(matched pool): the metric pass reuses
    // bm25BatchScored, so a 2M-doc corpus costs one term-filtered
    // scan + two bounded per-qid windows — no second corpus pass.
    val docs = spark.read.format("graft-synth")
      .option("rows", 2000000).option("parts", 32).option("seed", 13)
      .load()
    val qs = Seq(0 -> Seq("scan", "merge"), 1 -> Seq("hash", "filter"),
      2 -> Seq("join", "window"))
    val out = graft.operators.Retrieval.evalNdcgOver(docs, qs).collect()
    assert(out.map(_.getInt(0)).toSeq === qs.map(_._1))
    out.foreach { r =>
      val (dcg, idcg, nd) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dcg > 0 && dcg <= idcg && nd > 0 && nd <= 1000000L)
    }
  }

  test("bm25 final cut plans as TakeOrdered, not a global sort") {
    // The top-k cut must be the bounded partial-top-k operator —
    // a Sort+Limit over the scored relation would total-sort the
    // matching-doc set at scale.
    val plan = Retrieval.bm25(spark, sfDir).queryExecution
      .executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
  }

  test("bm25 batch: one shared scan serves every query; per-query " +
      "cut is the bounded aggregate, not a Window sort") {
    val df = Retrieval.bm25Batch(spark, sfDir)
    val out = df.collect()
    val byQ = out.groupBy(_.getInt(0))
    assert(byQ.keySet === Retrieval.BatchQueries.map(_._1).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to rs.length),
        s"qid $q ranks must be dense from 1")
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(scores.sliding(2).forall {
        case Array(a, b) => a >= b
        case _ => true
      }, s"qid $q scores must be non-increasing in rank")
    }
    // The per-query cut must plan as TopKWindowRewrite's bounded
    // aggregate — a Window would sort every matching doc per query.
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"per-query cut must not be a Window sort:\n${p.take(600)}")
    assert(p.contains("top_k_rows"), s"expected bounded aggregate:\n" +
      p.take(600))
    // And the batch term IN-list must sit beneath the bottom (tf)
    // Aggregate — the shared scan is filtered BEFORE any shuffle.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
    import org.apache.spark.sql.catalyst.expressions.In
    val nTerms = Retrieval.BatchQueries.flatMap(_._2).distinct.size
    val plan = df.queryExecution.optimizedPlan
    val aggs = plan.collect { case a: Aggregate => a }
    val bottom = aggs.filter(a =>
      a.child.collect { case x: Aggregate => x }.isEmpty)
    def hasTermInFilter(pl: LogicalPlan): Boolean =
      pl.collect {
        case f: Filter if f.condition.exists {
          case in: In => in.list.size == nTerms
          case _ => false
        } => f
      }.nonEmpty
    assert(bottom.exists(a => hasTermInFilter(a.child)),
      s"the batch term IN-list must sit BENEATH the tf Aggregate:\n$plan")
  }

  test("q_eval_ndcg: exact driver-side metric recomputation from " +
      "the served rankings and the matched pool") {
    val got = Retrieval.evalNdcg(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got.map(_._1) === Retrieval.BatchQueries.map(_._1))
    // Recompute from the same building blocks, driver-side.
    val pool = Retrieval.bm25BatchScored(
        Tables.documents(spark, sfDir), Retrieval.BatchQueries)
      .collect()
      .map(r => (r.getInt(0), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_terms"), r.getAs[Long]("su")))
    val disc = Retrieval.NdcgDiscMicro
    val want = Retrieval.BatchQueries.map(_._1).map { q =>
      val rows = pool.filter(_._1 == q)
      val served = rows.sortBy { case (_, id, _, su) => (-su, id) }
        .take(disc.size)
      val dcg = served.zipWithIndex
        .map { case ((_, _, nt, _), i) => nt * disc(i) }.sum
      val fr = served.indexWhere(_._3 >= Retrieval.MrrRelMin) match {
        case -1 => 0L
        case i => i + 1L
      }
      val idcg = rows.sortBy { case (_, id, nt, _) => (-nt, id) }
        .take(disc.size).zipWithIndex
        .map { case ((_, _, nt, _), i) => nt * disc(i) }.sum
      (q, dcg, idcg, 1000000L * dcg / math.max(idcg, 1L), fr,
        if (fr == 0) 0L else 1000000L / fr)
    }
    assert(got === want)
    // Metric sanity: DCG never exceeds IDCG; nDCG in (0, 1e6]; the
    // eval DISCRIMINATES on this corpus (not all queries perfect —
    // BM25's rarity weighting vs coverage relevance).
    got.foreach { case (_, dcg, idcg, nd, _, _) =>
      assert(dcg <= idcg && nd > 0 && nd <= 1000000L)
    }
    assert(got.exists(_._4 < 1000000L),
      "eval should discriminate: some query below perfect nDCG")
  }

  test("hard negatives: dense per-query ranks, self excluded, and " +
      "no mined negative shares a dedup band bucket with its query") {
    import graft.operators.{Dedup, Retrieval => R}
    val out = R.hardNegatives(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet === R.NegQueryDocs.toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1 to rs.length),
        s"qid $q ranks must be dense from 1")
      assert(!rs.exists(_._3 == q), s"qid $q must not mine itself")
      val scores = rs.sortBy(_._2).map(_._4)
      assert(scores.sliding(2).forall {
        case Array(a, b) => a >= b
        case _ => true
      })
    }
    // The exclusion contract, checked against the dedup tier's own
    // band-key surface: a mined negative never shares a bucket with
    // its query doc (i.e. it is NOT a minhash candidate of it).
    val sets = Tables.documents(spark, sfDir).select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("fs"))
    val bands = Dedup.bandKeysOf(sets).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byDoc = bands.groupBy(_._1).map { case (d, bs) =>
      d -> bs.map(_._2).toSet
    }
    out.foreach { case (q, _, d, _) =>
      assert((byDoc(q) & byDoc(d)).isEmpty,
        s"doc $d shares a band bucket with query $q — it is a " +
          "positive and must have been excluded")
    }
    // The exclusion anti-join must broadcast the bounded positive
    // set — a SortMergeJoin would shuffle every scored candidate.
    val p = R.hardNegatives(spark, sfDir).queryExecution
      .executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"exclusion must be a broadcast anti-join:\n${p.take(900)}")
  }

  test("bm25 plan filters to query terms before any aggregation") {
    // The O(matching docs) property: the BOTTOM Aggregate (the tf
    // aggregate, the first one above the scan) must have the query-
    // term IN-list Filter in its subtree, so the token stream is cut
    // to query terms before any shuffle. Walk the tree — string
    // ordering can't distinguish the two stacked Aggregates
    // (r6 ADVICE).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
    import org.apache.spark.sql.catalyst.expressions.In
    val plan = Retrieval.bm25(spark, sfDir).queryExecution.optimizedPlan
    val aggs = plan.collect { case a: Aggregate => a }
    assert(aggs.nonEmpty, "expected at least one Aggregate")
    // Bottom-most aggregate = the one whose subtree contains no other
    // Aggregate.
    val bottom = aggs.filter(a =>
      a.child.collect { case x: Aggregate => x }.isEmpty)
    assert(bottom.nonEmpty, "expected a bottom-most Aggregate")
    def hasTermInFilter(p: LogicalPlan): Boolean =
      p.collect {
        case f: Filter if f.condition.exists {
          case in: In => in.list.size == Retrieval.QueryTerms.size
          case _ => false
        } => f
      }.nonEmpty
    assert(bottom.exists(a => hasTermInFilter(a.child)),
      "the query-term IN-list Filter must sit BENEATH the bottom " +
        s"(tf) Aggregate:\n$plan")
  }

  private def nonEmptyPartitionFilter(plan: String): Boolean =
    "PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined ||
      plan.contains("dynamicpruning")

  test("stored text index: bm25 probe partition-prunes and equals inline") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_text_index").toString
    try {
      Retrieval.writeTextIndex(spark, sfDir, out)
      val probe = Retrieval.probeBm25Index(spark, out)
      val p = probe.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // The tb bucket predicate must reach BOTH the postings and df
      // scans as a non-empty partition filter (directory pruning —
      // the distributed GIN-probe property).
      assert(nonEmptyPartitionFilter(p), s"expected partition pruning:\n$p")
      assert(p.contains("tb"), s"expected the tb bucket filter:\n$p")
      val viaIndex = probe.collect().toSeq
      val inline = Retrieval.bm25(spark, sfDir).collect().toSeq
      assert(viaIndex === inline,
        "stored-postings BM25 must equal the inline scan exactly")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out)).deleteRecursively()
    }
  }

  test("append-only index: standing write + batch delta == full rebuild") {
    // The O(batch) refresh path: build the index over the standing
    // corpus, APPEND the ingest batch's delta (postings + additive
    // df/stats rows), and the probe must equal the inline BM25 over
    // the whole corpus — no rebuild, no read-modify-write.
    import graft.operators.Dedup
    val out = java.nio.file.Files
      .createTempDirectory("graft_text_incr").toString
    try {
      val docs = Tables.documents(spark, sfDir)
      Retrieval.writeBm25IndexOver(
        docs.where(col("doc_id") % Dedup.IncrMod =!= 0), out)
      Retrieval.appendBm25Delta(
        docs.where(col("doc_id") % Dedup.IncrMod === 0), out)
      val viaIndex = Retrieval.probeBm25Index(spark, out).collect().toSeq
      val inline = Retrieval.bm25(spark, sfDir).collect().toSeq
      assert(viaIndex === inline,
        "standing + appended delta must serve the full-corpus answer")
      // Compaction (the LSM maintenance pair of the append): delta
      // rows collapse, probe unchanged.
      val compacted = out + "_compact"
      Retrieval.compactBm25Index(spark, out, compacted)
      try {
        assert(spark.read.parquet(s"$compacted/stats").count() === 1,
          "stats deltas must collapse to one row")
        val viaCompacted =
          Retrieval.probeBm25Index(spark, compacted).collect().toSeq
        assert(viaCompacted === inline,
          "compaction must not change the served answer")
      } finally {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(compacted)).deleteRecursively()
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out)).deleteRecursively()
    }
  }

  test("streaming ingest maintains the text index: per-micro-batch " +
      "appends serve the batch answer") {
    // The CONTINUOUS form of appendBm25Delta: a documents stream
    // lands in the index one O(batch) append per micro-batch
    // (foreachBatch), and the probe over the accumulated index
    // equals the inline batch BM25 — the text twin of the
    // reference's re-upsert-on-every-ingest loop, running on
    // Structured Streaming.
    import org.apache.spark.sql.streaming.Trigger
    val src = java.nio.file.Files
      .createTempDirectory("graft_stream_ingest_src").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft_stream_ingest_idx").toString
    try {
      val docs = Tables.documents(spark, sfDir)
      (0 until 3).foreach { i =>
        docs.where(pmod(col("doc_id"), lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(src)
      }
      val schema = spark.read.parquet(src).schema
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.operators.Retrieval.appendBm25Delta(batch, out)
        }
        .option("checkpointLocation", s"$src/_ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val viaIndex = Retrieval.probeBm25Index(spark, out).collect().toSeq
      val inline = Retrieval.bm25(spark, sfDir).collect().toSeq
      assert(viaIndex === inline,
        "streamed per-batch appends must serve the batch answer")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(src)).deleteRecursively()
      new Directory(new java.io.File(out)).deleteRecursively()
    }
  }

  test("append-only trigram tier: standing write + batch delta == " +
      "full rebuild") {
    // The trigram twin of the bm25 append proof: build over the
    // standing corpus, append the ingest batch's postings, and the
    // probe must equal the probe of a full rebuild — the tier's
    // O(batch) refresh.
    import graft.operators.Dedup
    val incr = java.nio.file.Files
      .createTempDirectory("graft_trgm_incr").toString
    val full = java.nio.file.Files
      .createTempDirectory("graft_trgm_full").toString
    try {
      val docs = Tables.documents(spark, sfDir)
      Retrieval.appendTrgmDelta(
        docs.where(col("doc_id") % Dedup.IncrMod =!= 0), incr)
      Retrieval.appendTrgmDelta(
        docs.where(col("doc_id") % Dedup.IncrMod === 0), incr)
      Retrieval.writeTrgmIndex(spark, sfDir, full)
      val q = graft.operators.Lexical.trigramQuery
      val viaIncr = Retrieval.probeTrgmIndex(spark, incr, q,
        Retrieval.TrgmThreshold, 10).collect().toSeq
      val viaFull = Retrieval.probeTrgmIndex(spark, full, q,
        Retrieval.TrgmThreshold, 10).collect().toSeq
      assert(viaIncr === viaFull,
        "standing + appended trigram delta must serve the rebuild answer")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(incr)).deleteRecursively()
      new Directory(new java.io.File(full)).deleteRecursively()
    }
  }

  test("federated search: per-source budgets respected, bounded cut, " +
      "source-pruned scan") {
    val rows = graft.operators.Retrieval.federated(spark, sfDir).collect()
    val bySource = rows.groupBy(_.getString(0))
    val budgets = graft.operators.Retrieval.FederatedBudgets.toMap
    assert(bySource.keySet === budgets.keySet,
      "exactly the budgeted sources must appear")
    bySource.foreach { case (src, rs) =>
      assert(rs.length === budgets(src),
        s"$src must return its own k=${budgets(src)}, got ${rs.length}")
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to budgets(src)),
        s"$src ranks must be 1..k")
    }
    val p = graft.operators.Retrieval.federated(spark, sfDir)
      .queryExecution.executedPlan.toString
    // The per-source cut must be the bounded aggregate, not a
    // per-source sort of the scored corpus.
    assert(p.contains("top_k_rows"), s"expected the bounded cut:\n$p")
    assert(!p.contains("Window"), s"no window sort at scale:\n$p")
  }

  test("stored trigram postings: prefilter+verify equals the full scan") {
    import graft.functions.TextFunctions.{docName, trigramSim}
    val out = java.nio.file.Files
      .createTempDirectory("graft_trgm_index").toString
    try {
      Retrieval.writeTextIndex(spark, sfDir, out)
      val q = graft.operators.Lexical.trigramQuery
      val probe = Retrieval.probeTrgmIndex(spark, out, q,
        Retrieval.TrgmThreshold, 10)
      val p = probe.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(nonEmptyPartitionFilter(p), s"expected partition pruning:\n$p")
      // Brute force: similarity against EVERY name, threshold, top-10.
      val full = Tables.documents(spark, sfDir)
        .select(col("doc_id"), docName(col("text")).as("name"))
        .select(col("doc_id"), col("name"),
          trigramSim(col("name"), lit(q)).as("sim"))
        .where(col("sim") >= Retrieval.TrgmThreshold)
        .orderBy(col("sim").desc, col("doc_id").asc).limit(10)
        .select(col("doc_id"), col("name"), round(col("sim"), 6).as("sim"))
      assert(probe.collect().toSeq === full.collect().toSeq,
        "posting-list prefilter must lose nothing vs the full scan")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out)).deleteRecursively()
    }
  }

  test("q_text_phrase: exact sliding-window recomputation; " +
      "postings pruned before the join chain") {
    val got = Retrieval.phraseSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val phrase = Seq("big", "order", "scan")
    val want = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "source", "text").collect()
      .flatMap { r =>
        val t = r.getString(2).split(" ", -1)
        val tf = t.sliding(phrase.size)
          .count(w => w.length == phrase.size && w.sameElements(phrase)).toLong
        if (tf > 0) Some((r.getLong(0), r.getString(1), tf)) else None
      }.sortBy(x => (-x._3, x._1)).toSeq
    assert(got.toSeq === want)
    assert(got.nonEmpty, "phrase row is vacuous at this SF")
    // Adjacency matters: at least one doc contains all three terms
    // WITHOUT the consecutive phrase (bag-of-words would overmatch).
    val bag = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .count { r =>
        val t = r.getString(1).split(" ", -1).toSet
        phrase.forall(t.contains)
      }
    assert(bag > got.length,
      "corpus cannot distinguish phrase match from AND match here")
    val p = Retrieval.phraseSearch(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    // The postings sub-plan (pre-cut — the final plan shows only the
    // materialized stitch) must prune to the phrase terms before any
    // shuffle, and the full query must materialize the explode ONCE.
    val pp = Retrieval.phrasePostings(spark, sfDir, phrase)
      .queryExecution.executedPlan.toString
    assert(pp.contains("isin") || pp.contains("IN ("),
      s"term pruning must precede the join chain, got:\n$pp")
    assert(!p.contains("Generate") && !p.toLowerCase.contains("posexplode"),
      s"corpus explode must be materialized once via the cut, got:\n$p")
  }

  test("q_phrase_idx: stored positional probe is partition-pruned, " +
      "equals the inline scan, and append-delta equals rebuild") {
    val full = java.nio.file.Files
      .createTempDirectory("graft_pos_full").toString
    val incr = java.nio.file.Files
      .createTempDirectory("graft_pos_incr").toString
    try {
      Retrieval.writePosIndex(spark, sfDir, full)
      val phrase = Retrieval.PhraseTerms
      val probe = Retrieval.probePhraseIndex(spark, full, phrase, sfDir)
      // Pruning asserted on the pre-cut positions read — the final
      // plan shows only the materialized stitch.
      val p = Retrieval.posProbePostings(spark, full, phrase)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(nonEmptyPartitionFilter(p),
        s"positions probe must prune to the phrase terms' buckets:\n$p")
      val inline = Retrieval.phraseSearch(spark, sfDir).collect().toSeq
      assert(probe.collect().toSeq === inline,
        "stored positional probe must serve the inline scan's answer")
      // O(batch) maintenance: standing + appended delta ≡ rebuild.
      import graft.operators.Dedup
      val docs = Tables.documents(spark, sfDir)
      Retrieval.appendPosDelta(
        docs.where(col("doc_id") % Dedup.IncrMod =!= 0), incr)
      Retrieval.appendPosDelta(
        docs.where(col("doc_id") % Dedup.IncrMod === 0), incr)
      val viaIncr = Retrieval.probePhraseIndex(spark, incr, phrase, sfDir)
        .collect().toSeq
      assert(viaIncr === inline,
        "standing + appended positional delta must serve the rebuild answer")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(full)).deleteRecursively()
      new Directory(new java.io.File(incr)).deleteRecursively()
    }
  }
}
