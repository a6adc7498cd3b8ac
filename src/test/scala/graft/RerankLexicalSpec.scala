package graft

import org.apache.spark.sql.functions._

import graft.operators.{Lexical, Rerank}

/** Semantic invariants of the rerank/fusion and tiered-search
  * control flow — the reference's headline behaviors (these are
  * oracle-gated for values; here we pin the SHAPE of the answers). */
class RerankLexicalSpec extends SparkSuite {

  test("rerank score is the documented blend and descending") {
    val rows = Rerank.rerank(spark, sfDir).collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._3 >= b._3 - 1e-9)
      case _ =>
    }
    // score ≈ 0.7·sim + 0.2·tri + 0.1·sr with sr ∈ [0,1] — bound it
    rows.foreach { case (sim, tri, score) =>
      val base = 0.7 * sim + 0.2 * tri
      assert(score >= base - 1e-4 && score <= base + 0.1 + 1e-4,
        s"score $score outside blend bounds for sim=$sim tri=$tri")
    }
  }

  test("fusion emits at most finalK docs with at least one modality rank") {
    val rows = Rerank.fusion(spark, sfDir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    rows.foreach { r =>
      val ranks = Seq(1, 2, 3).map(i =>
        if (r.isNullAt(i)) None else Some(r.getInt(i)))
      assert(ranks.exists(_.isDefined), s"row with no modality rank: $r")
      assert(ranks.flatten.forall(x => x >= 1 && x <= 20))
    }
    // RRF descending with doc_id tiebreak
    val rrf = rows.map(_.getDouble(4))
    rrf.sliding(2).foreach {
      case Array(a, b) => assert(a >= b - 1e-12)
      case _ =>
    }
  }

  test("tiered search: all returned rows come from ONE tier (first non-empty)") {
    val rows = Lexical.nameTiered(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val tiers = rows.map(_.getInt(3)).distinct
    assert(tiers.length === 1, s"rows from multiple tiers: ${tiers.toSeq}")
  }

  test("trigram prefilter is lossless vs brute force, incl. degenerate queries") {
    // The r6 weak-plan fix: candidates = names sharing >= 1 trigram,
    // exact verify on candidates, sim-0 fill for the rest. Must equal
    // the full scan for ANY query — including one overlapping nothing
    // (pure fill path) and one too short to have trigrams at all.
    import graft.functions.TextFunctions.{docName, trigramSim}
    val n = Tables.documents(spark, sfDir)
      .select(col("doc_id"), docName(col("text")).as("name"))
    def brute(q: String) = n
      .select(col("doc_id"), col("name"),
        trigramSim(col("name"), lit(q)).as("sim"))
      .orderBy(col("sim").desc, col("doc_id").asc).limit(10)
      .select(col("doc_id"), col("name"), round(col("sim"), 6).as("sim"))
      .collect().toSeq
    for (q <- Seq(Lexical.trigramQuery, "zzzqqqvvv", "zz", "")) {
      val got = Lexical.trgPrefilterTopK(n, q, 10)
        .select(col("doc_id"), col("name"), round(col("sim"), 6).as("sim"))
        .collect().toSeq
      assert(got === brute(q), s"prefilter diverges from full scan for '$q'")
    }
  }

  test("q_fuzzy_join: FastSS blocking is lossless vs the brute-force " +
      "quadratic scan; no self/duplicate pairs; plan has no cartesian") {
    val names = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // Driver-side brute force: every unordered pair with lev <= 1.
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, na) <- names; (ib, nb) <- names
      if ia < ib && lev(na, nb) <= 1
    } yield (ia, ib, lev(na, nb).toLong)).toSet
    val got = Lexical.fuzzyJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "fixture must produce near-identical pairs")
    assert(got.length === got.toSet.size, "duplicate pairs emitted")
    got.foreach { case (a, b, _) => assert(a < b, s"unordered pair ($a,$b)") }
    assert(got.toSet === want,
      s"FastSS join diverged from brute force: got ${got.length} " +
        s"want ${want.size}")
    val p = Lexical.fuzzyJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in plan:\n$p")
  }

  test("q_fuzzy_join hot-bucket cap at 1.1M names: a million-member " +
      "identical block keeps candidate volume linear; star edges verified") {
    // Zero-storage adversarial corpus: 1M names IDENTICAL (every
    // variant bucket they touch is a million-hot — the pairwise
    // bucket join would emit ~5·10¹¹ candidates) + 100k distinct
    // names whose buckets stay honest. The cap must (a) keep
    // candidate volume O(n·L), (b) leave the cold names' pairs
    // exactly as the uncapped join computes them (the sf-fixture
    // lossless test pins that), (c) still emit the hot block as
    // verified star edges off its min-id representative.
    val n = 1100000L
    val hotN = 1000000L
    val names = spark.range(n).select(col("id"),
      when(col("id") < hotN, lit("hotblockname"))
        .otherwise(concat(lit("cold"), col("id").cast("string"))).as("nm"))
    val cand = graft.operators.Lexical.fuzzyCandidates(names)
    val cnt = cand.count()
    // L ≤ 12 ⇒ ≤ 13 variants/name ⇒ star candidates ≤ 13·n before the
    // pair-distinct; anything quadratic would be ~10¹¹.
    assert(cnt <= 20L * n,
      s"candidate volume must stay linear under the cap, got $cnt")
    info(f"candidates at n=$n with a $hotN-member identical block: " +
      f"$cnt (${cnt.toDouble / n}%.2f per name)")
    // The hot block survives as verified rep→member star edges: every
    // member pairs with the block's min id (0), distance 0 ≤ 1.
    val hotEdges = graft.operators.Lexical.fuzzyJoinOver(spark, names)
      .where(col("a_key") === 0L && col("b_key") < hotN)
    assert(hotEdges.count() === hotN - 1,
      "identical block must collapse to rep star edges, all verified")
  }

  test("trigram prefilter operating point at 1M names: selective query " +
      "prunes, stopword query measured honest, both lossless") {
    // The text twin of the ANN operating-point audits: 1M synthetic
    // names (zero storage), two query classes. A typo'd rare word
    // ("custmer") shares trigrams with only the customer/merge-ish
    // slice of the corpus; the multi-word tier-3 query is built from
    // common vocab + spaces and degrades toward a full verify — the
    // measurement is what tells a deployment which class the index
    // serves. Losslessness (prefilter ≡ full scan) must hold at BOTH
    // selectivities.
    import graft.functions.MinHash.hash60Local
    import graft.functions.TextFunctions.{docName, trigramsOf}
    val names = spark.read.format("graft-synth")
      .option("rows", 1000000).option("parts", 16).option("seed", 7)
      .load()
      .select(col("doc_id"), docName(col("text")).as("name"))
    val (selFrac, selEq) = Lexical.trgmOperatingPoint(names, "custmer")
    val buckets = trigramsOf("custmer")
      .map(t => hash60Local("tg:" + t) % 64L).distinct.size
    info(f"selective 'custmer': candidate fraction = $selFrac%.4f, " +
      f"stored-probe read = $buckets/64 posting buckets")
    assert(selEq, "prefilter must equal the full scan (selective)")
    assert(selFrac < 0.5, f"typo'd rare word should prune: $selFrac%.4f")
    assert(buckets <= trigramsOf("custmer").size)
    val (stopFrac, stopEq) =
      Lexical.trgmOperatingPoint(names, Lexical.trigramQuery)
    info(f"stopword-like tier-3 query: candidate fraction = $stopFrac%.4f")
    assert(stopEq, "prefilter must equal the full scan (degraded)")
    // 24-char names carry ~4 vocab words, so even the common-vocab
    // query leaves ~2.5x the selective query's verify set (measured
    // 0.69 vs 0.28 at 1M) — the spread between query classes is the
    // routing signal.
    assert(stopFrac > 2 * selFrac,
      f"common-vocab query should verify far more than the typo'd " +
        f"rare word: $stopFrac%.4f vs $selFrac%.4f")
  }

  test("tier-1 exact hit short-circuits the fallback") {
    // Build a tiered query for a name that exists verbatim: tier must be 1.
    val name = Tables.documents(spark, sfDir)
      .select(graft.functions.TextFunctions.docName(col("text")).as("n"))
      .head().getString(0)
    val rows = Lexical.nameTieredFor(spark, sfDir, name).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(3) === 1),
      s"exact name '$name' must resolve in tier 1")
  }

  test("search_e2e: stage containment, blend arithmetic, bounded refs") {
    val out = Rerank.searchE2e(spark, sfDir).collect()
    assert(out.length === 5)
    // Final ordering is the rerank score, descending.
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.sliding(2).forall(p => p.head >= p.last - 1e-9))
    out.foreach { r =>
      // Every final hit came through the fusion stage: at least one
      // tier rank present, and ranks are within their tier cuts.
      val rl = Option(r.getAs[Integer]("r_lex")).map(_.toInt)
      val rv = Option(r.getAs[Integer]("r_vec")).map(_.toInt)
      assert(rl.nonEmpty || rv.nonEmpty)
      (rl.toSeq ++ rv.toSeq).foreach(x => assert(x >= 1 && x <= 20))
      // Rerank blend recomputes from its own feature columns.
      val expect = 0.7d * r.getAs[Double]("sim") + 0.3d * r.getAs[Double]("tri")
      assert(math.abs(r.getAs[Double]("score") - expect) < 1e-5)
      // The expansion rule derives at most 3 refs per hit.
      assert(r.getAs[Long]("n_related") >= 0L &&
        r.getAs[Long]("n_related") <= 3L)
    }
  }
}
