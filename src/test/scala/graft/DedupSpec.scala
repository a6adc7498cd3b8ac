package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.functions.TextFunctions._

/** Direct evidence for the dedup scale claims: star candidates stay
  * LINEAR in corpus size even though this corpus contains large
  * duplicate clusters (all-pairs would be quadratic), and the
  * SimHash pair stage respects its Hamming bound. */
class DedupSpec extends SparkSuite {

  test("LSH star candidates are bounded by docs × bands (never quadratic)") {
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val feats = docs.select(col("doc_id"),
      explode(tokenSet(col("text"))).as("f"))
    val nCand = Dedup.bandCandidates(Dedup.signature(feats)).count()
    // Star generation: each doc contributes at most one pair per
    // band. All-pairs within this corpus's duplicate clusters would
    // exceed this bound by orders of magnitude.
    assert(nCand <= nDocs * Dedup.NumBands,
      s"$nCand candidates for $nDocs docs × ${Dedup.NumBands} bands")
    assert(nCand > 0, "corpus has near-dups; candidates must exist")
  }

  test("simhash pairs respect the Hamming radius") {
    val rows = Dedup.simhashPairs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(3) <= 10))
  }

  test("simhash candidates stay linear on a degenerate bucket " +
      "(1k identical docs)") {
    // 1,000 byte-identical docs collapse to ONE simhash → one bucket
    // per band. All-pairs within that bucket would be ~499,500 pairs
    // per band; the star emits exactly n−1 distinct (rep, member)
    // pairs. A few distinct docs ride along to keep the plan honest.
    import spark.implicits._
    val n = 1000
    val docs = ((0 until n).map(i => (i.toLong, "s0",
        "the same exact duplicated document text body")) ++
      Seq((9000L, "s0", "completely different content one"),
        (9001L, "s0", "another unrelated piece of text")))
      .toDF("doc_id", "source", "text")
    val nCand = Dedup.simhashCandidates(Dedup.simhashOf(docs)).count()
    assert(nCand <= (n + 2) + 2 * Dedup.SimHashBands,
      s"star candidates must be linear in cluster size, got $nCand")
    assert(nCand >= n - 1, s"every cluster member must pair its rep: $nCand")
  }

  test("embedding candidates stay linear on a degenerate code bucket") {
    // 1,000 identical vectors share one hyperplane code → one bucket
    // per band; the star emits n−1 pairs, not ~n²/2.
    import spark.implicits._
    val n = 1000
    val v = Array.tabulate(64)(i => (if (i % 2 == 0) 1.0d else -0.5d))
    val w = Array.tabulate(64)(i => (if (i % 3 == 0) -1.0d else 0.25d))
    val vecs = ((0 until n).map(i => (i.toLong, v)) ++
      Seq((9000L, w))).toDF("vec_id", "embedding")
    val coded = vecs.select(col("vec_id"),
      graft.functions.Lsh.bucketCode(col("embedding"),
        graft.functions.Lsh.planes(Dedup.EmbPlanes, 64)).as("code"))
    val nCand = Dedup.embeddingCandidates(coded).count()
    assert(nCand <= (n + 1) + Dedup.EmbBands,
      s"star candidates must be linear in cluster size, got $nCand")
    assert(nCand >= n - 1, s"every cluster member must pair its rep: $nCand")
  }

  test("convergeLabels reaches the fixpoint on a chain where a fixed " +
      "two-sweep prefix provably cannot") {
    import spark.implicits._
    // Path graph 0—1—…—9, symmetrized: the component min label 0
    // needs 9 propagation hops to reach node 9. After k sweeps
    // lab(i) = max(0, i − k), so ANY fixed sweep count under-merges
    // a long enough chain; the convergence loop must not.
    val und = (0 until 9)
      .flatMap(i => Seq((i.toLong, i + 1L), (i + 1L, i.toLong)))
      .toDF("a", "b")
    val fix = Dedup.convergeLabels(und).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 9L).forall(fix(_) == 0L),
      s"fixpoint must label the whole chain 0: $fix")
    // A 2-sweep cap cannot converge a 9-hop chain — and an
    // under-converged result must FAIL, not return silently.
    val ex = intercept[IllegalStateException] {
      Dedup.convergeLabels(und, maxSweeps = 2)
    }
    assert(ex.getMessage.contains("2 sweeps"))
  }

  test("convergeLabels canonicalizes 200k nodes of chained stars " +
      "(scale smoke, zero storage)") {
    // 2,000 stars of 100 members; consecutive stars chained into
    // blocks of 8 via rep-rep bridges — the overlapping-star
    // topology the two-sweep prefix under-merges. Expected fixpoint
    // label of node i is its block minimum (i DIV 800) * 800. The
    // diameter (~9 hops: member → rep → …7 bridges… → member) keeps
    // the sweep count small while the edge relation (~400k rows)
    // exercises the distributed join path.
    import org.apache.spark.sql.functions.expr
    val n = 200000L
    val ids = spark.range(n).toDF("id")
    val starEdges = ids.where(col("id") % 100 =!= 0)
      .select((col("id") - (col("id") % 100)).as("a"), col("id").as("b"))
    val bridges = ids
      .where(col("id") % 100 === 0 && expr("(id DIV 100) % 8") =!= 0)
      .select((col("id") - lit(100)).as("a"), col("id").as("b"))
    val half = starEdges.unionAll(bridges)
    val und = half.unionAll(half.select(col("b").as("a"), col("a").as("b")))
    val lab = Dedup.convergeLabels(und)
    assert(lab.count() === n)
    val bad = lab
      .join(ids.select(col("id").as("doc_id"),
        expr("(id DIV 800) * 800").as("want")), Seq("doc_id"))
      .where(col("lab") =!= col("want")).count()
    assert(bad === 0L, s"$bad nodes not canonicalized to their block min")
  }

  test("converged clustering equals two-sweep clustering when the " +
      "corpus has no long chains, and never splits clusters") {
    // On this synthetic corpus near-dup clusters are star-shaped, so
    // the two results should agree — and if they ever differ, the
    // converged one must be at least as merged (fewer, larger
    // clusters), never more split.
    val twoSweep = Dedup.dedupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val fix = Dedup.convergedClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(fix.map(_._2).sum >= twoSweep.map(_._2).sum,
      "fixpoint top-30 mass must be >= two-sweep prefix's")
  }

  test("substring dedup: hashed-span counts equal a raw-string span " +
      "recomputation on the real corpus") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.tokens
    // Independent recomputation grouping on the span STRINGS (no
    // md5): any hash-collision artifact or off-by-one in the sliding
    // window would diverge. The corpus has >1k duplicated spans, so
    // the comparison exercises the occ >= 2 path for real.
    val W = Dedup.SpanW
    val toks = tokens(col("text"))
    val n = size(toks) - (W - 1)
    val raw = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(when(n > 0, transform(sequence(lit(1), n),
          p => concat_ws(" ", slice(toks, p, lit(W)))))
          .otherwise(array().cast("array<string>"))).as("s"))
    val byDocSpan = raw.groupBy(col("s"), col("doc_id"))
      .agg(count(lit(1)).as("k"))
    val occ = byDocSpan.groupBy(col("s")).agg(sum(col("k")).as("occ"))
    val expected = byDocSpan.join(occ, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("ns"),
        sum(when(col("occ") >= 2, col("k")).otherwise(0L)).as("nd"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(expected.values.exists(_._2 > 0),
      "corpus must contain duplicated spans for the test to bite")
    val got = Dedup.substringDedup(spark, sfDir, topN = 1000000).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, (ns, nd, frac)) =>
      assert((ns, nd) === expected(id), s"span counts drift for doc $id")
      assert(frac >= 0.0 && frac <= 1.0)
    }
  }

  test("substring dedup plans exactly two shuffles: one h exchange " +
      "serves both aggregates and the join") {
    // HashPartitioning(h) satisfies the clustered distributions of
    // the (h, doc_id) aggregate, the h aggregate and the h join, so
    // the explicit repartition(h) plus the final doc_id aggregate are
    // the ONLY exchanges — the property that keeps the span-postings
    // relation (O(total tokens) rows at 100 TB) from shuffling twice
    // more.
    val p = Dedup.substringDedup(spark, sfDir).queryExecution
      .executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n === 2, s"expected exactly 2 shuffle exchanges, got $n:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size <= 1,
      s"the corpus must be scanned at most once (lineage cut):\n$p")
    // Tokenization must stay a projected attribute: if CollapseProject
    // re-inlined it, split(text) would re-run once per span position
    // (O(spans × tokens) per doc). One occurrence = the projection.
    assert("split\\(".r.findAllIn(p).size <= 1,
      s"split must be evaluated once per row, not per span:\n$p")
  }

  test("substring dedup catches a copied span that whole-doc hashing " +
      "misses") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Two docs sharing one 8-token run but nothing else: no exact-dup,
    // Jaccard far below any near-dup bar, yet the span pass flags both.
    val span = (1 to Dedup.SpanW).map(i => s"copied$i").mkString(" ")
    val rows = Seq(
      (1L, s"alpha beta gamma delta $span epsilon zeta"),
      (2L, s"one two three four five $span six seven"),
      (3L, "entirely unrelated filler words nothing shared here at all"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_substring").toString
    try {
      rows.write.parquet(s"$dir/documents.parquet")
      val out = Dedup.substringDedup(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val byId = out.map(t => t._1 -> t).toMap
      assert(byId(1L)._3 >= 1 && byId(2L)._3 >= 1,
        s"both span-sharing docs must report duplicated spans: $out")
      assert(byId(3L)._3 === 0L,
        s"the unrelated doc must report zero duplicated spans: $out")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("substring dedup scales: 200k synthetic docs, zero storage") {
    // Same zero-storage smoke shape as the bm25/cluster ones: 200k
    // synth docs through the full span pipeline. The synth corpus
    // repeats template phrases, so duplicated spans exist at volume;
    // the checks are structural (bounded cut, sane fractions) — a
    // quadratic regression would blow the runtime, not the assert.
    val docs = spark.read.format("graft-synth")
      .option("rows", 200000).option("parts", 16).option("seed", 11)
      .load()
    val top = Dedup.substringDedupOver(docs, topN = 25).collect()
    assert(top.length === 25)
    top.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(2) <= r.getLong(1))
      val f = r.getDouble(3)
      assert(f >= 0.0 && f <= 1.0)
    }
    assert(top.exists(_.getLong(2) > 0),
      "the synth corpus must surface duplicated spans")
  }

  private def md5str(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("segment dedup equals a segment-string recomputation: first " +
      "global occurrence wins, reassembly preserves order") {
    // Independent driver-side recompute grouping on the segment
    // STRINGS (no md5 in the winner rule) and rebuilding each doc's
    // cleaned text by hand — an off-by-one in the slicing, a wrong
    // keep/drop decision, or a reordered segment in the reassembly
    // all diverge on clean_md5.
    val W = Dedup.SegW
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val segs = docs.flatMap { case (id, text) =>
      text.split(" ", -1).grouped(W).zipWithIndex
        .map { case (g, p) => (id, p.toLong, g.mkString(" ")) }
    }
    val win = segs.groupBy(_._3).map { case (s, occ) =>
      s -> occ.map(t => (t._1, t._2)).min
    }
    val keptBy = segs.filter(t => win(t._3) == ((t._1, t._2)))
      .groupBy(_._1)
    val nSegBy = segs.groupBy(_._1).map { case (id, ss) => id -> ss.length }
    val expected = docs.map { case (id, _) =>
      val ks = keptBy.getOrElse(id, Array.empty[(Long, Long, String)])
        .sortBy(_._2)
      id -> ((nSegBy(id).toLong, ks.length.toLong,
        md5str(ks.map(_._3).mkString(" "))))
    }.toMap
    assert(expected.exists { case (_, (n, k, _)) => k < n },
      "corpus must contain removable duplicate segments to bite")
    val got = Dedup.segDedup(spark, sfDir, topN = 1000000).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, g) =>
      assert(g === expected(id), s"segment rewrite drifts for doc $id")
    }
  }

  test("segment dedup: a full copy reassembles to the empty string; " +
      "the first occurrence is untouched") {
    import spark.implicits._
    val words = (1 to 24).map(i => s"w$i").mkString(" ") // exactly 3 segments
    val docs = Seq(
      (1L, words), (2L, words),
      (3L, "unique content entirely different body of words"))
      .toDF("doc_id", "text")
    val out = Dedup.segDedupOver(docs, 10).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    assert(out(1L) === ((3L, 3L, md5str(words))),
      "the globally-first copy must survive byte-identical")
    assert(out(2L)._1 === 3L && out(2L)._2 === 0L &&
      out(2L)._3 === md5str(""),
      s"the later copy must lose every segment: ${out(2L)}")
    assert(out(3L)._2 === out(3L)._1, "unique doc must keep everything")
  }

  test("segment dedup: the segment text crosses exactly one shuffle " +
      "(winner election runs on long pairs)") {
    // The scale property of the rewrite plan: keep/drop is decided on
    // (h, ok) longs, so the only exchange whose rows carry the segment
    // string is the single doc_id shuffle that serves both the keep
    // join and the reassembly aggregate. A regression that routes the
    // text through the h exchange doubles the wire volume of the
    // dominant relation.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Dedup.segDedup(spark, sfDir).queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty, "sanity: the plan does shuffle somewhere")
      val textShuffles = shuffles.filter(_.output.exists(a =>
        a.dataType == org.apache.spark.sql.types.StringType))
      assert(textShuffles.size <= 1,
        s"segment text must shuffle at most once:\n" +
          textShuffles.mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("incremental segment dedup == full rebuild on the batch when " +
      "arrival order matches id order") {
    import spark.implicits._
    // Batch ids strictly follow corpus ids, so arrival-order
    // first-come (the incremental contract) coincides with min-ok
    // first-come (the full rebuild): the O(batch) probe must
    // reproduce the rebuild's keep/drop and reassembly exactly.
    val span = (1 to 8).map(i => s"c$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$span alpha beta gamma delta eps zeta eta theta"),
      (2L, "plain corpus body with its own words entirely"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, s"$span one two three four five six seven eight"),
      (101L, "fresh batch content nothing previously claimed here"),
      (101L + 1, s"$span $span"))
      .toDF("doc_id", "text")
    val incr = Dedup.segIncrementalOver(corpus, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
      .sortBy(_._1)
    val rebuild = Dedup.segDedupOver(corpus.unionAll(batch), 1000000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
      .filter(_._1 >= 100L).sortBy(_._1)
    assert(incr === rebuild,
      s"incremental drifts from rebuild:\n$incr\nvs\n$rebuild")
    val byId = incr.map(t => t._1 -> t).toMap
    assert(byId(100L)._3 < byId(100L)._2,
      "the claimed span must be dropped from the batch doc")
    assert(byId(101L)._3 === byId(101L)._2,
      "fresh content must keep everything")
  }

  test("segment dedup scales: 200k synthetic docs, zero storage") {
    // Template-heavy synth docs share many 8-token segments, so the
    // removal pass bites at volume; checks are structural — a plan
    // regression that shuffles the text twice (or goes quadratic)
    // shows up as runtime, not as a wrong answer.
    val docs = spark.read.format("graft-synth")
      .option("rows", 200000).option("parts", 16).option("seed", 12)
      .load()
    val top = Dedup.segDedupOver(docs, 25).collect()
    assert(top.length === 25)
    top.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(2) <= r.getLong(1))
      val f = r.getDouble(3)
      assert(f >= 0.0 && f <= 1.0)
    }
    assert(top.exists(r => r.getLong(2) < r.getLong(1)),
      "the synth corpus must surface removable duplicate segments")
  }

  test("incremental segment dedup scales: 1M synthetic docs, " +
      "zero storage") {
    // ~941k corpus docs claim their segments; the ~59k-doc batch
    // (ids % IncrMod == 0) probes the claimed set. The probe is
    // long-pairs only, so a regression that drags text into the
    // anti-join or rescans the corpus per batch doc shows up as
    // runtime; the asserts pin batch completeness and sane fractions.
    import org.apache.spark.sql.functions._
    val docs = spark.read.format("graft-synth")
      .option("rows", 1000000).option("parts", 32).option("seed", 13)
      .load()
    val isBatch = col("doc_id") % Dedup.IncrMod === 0
    val out = Dedup.segIncrementalOver(
      docs.where(!isBatch), docs.where(isBatch))
    val rows = out.agg(count(lit(1)), sum(col("n_kept")), sum(col("n_seg")),
      min(col("removed_frac")), max(col("removed_frac"))).collect()(0)
    val expectedBatch = docs.where(isBatch).count()
    assert(rows.getLong(0) === expectedBatch,
      "every batch doc must be reported exactly once")
    assert(rows.getLong(1) <= rows.getLong(2))
    assert(rows.getDouble(3) >= 0.0 && rows.getDouble(4) <= 1.0)
    assert(rows.getLong(1) < rows.getLong(2),
      "the template-heavy synth corpus must claim some batch segments")
  }

  test("split leakage flags a planted cross-split near-dup and " +
      "nothing else") {
    import spark.implicits._
    def isVal(id: Long) =
      graft.functions.MinHash.hash60Local(s"split:$id") %
        Dedup.SplitMod == 0
    val valIds = (0L to 2000L).filter(isVal).take(2)
    val trainIds = (0L to 2000L).filterNot(isVal).take(2)
    val txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (valIds(0), "s0", txt), // leaked: identical twin in train
      (trainIds(0), "s0", txt),
      (valIds(1), "s1", "totally different words nothing shared here"),
      (trainIds(1), "s1", "unrelated training content body of text"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.splitLeakageOver(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("s0") === ((1L, 1L, 1.0d)),
      s"planted leak must be flagged: ${out.get("s0")}")
    assert(out("s1") === ((1L, 0L, 0.0d)),
      s"clean split must report zero leaks: ${out.get("s1")}")
  }

  test("split leakage on the corpus: val counts match the driver " +
      "hash split; every reported leak is a true near-dup (soundness)") {
    def isVal(id: Long) =
      graft.functions.MinHash.hash60Local(s"split:$id") %
        Dedup.SplitMod == 0
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).toSet))
    val nVal = docs.filter(d => isVal(d._1)).groupBy(_._2)
      .map { case (s, ds) => s -> ds.length.toLong }
    // Brute-force superset: val docs with ANY train doc at >= LeakJac
    // (the query's rep-star candidates are a subset of all pairs, so
    // reported leaks can never exceed this).
    val train = docs.filterNot(d => isVal(d._1))
    def jac(a: Set[String], b: Set[String]): Double =
      if ((a ++ b).isEmpty) 0.0
      else (a & b).size.toDouble / (a ++ b).size
    val bruteLeak = docs.filter(d => isVal(d._1))
      .filter(d => train.exists(t => jac(d._3, t._3) >= Dedup.LeakJac))
      .groupBy(_._2).map { case (s, ds) => s -> ds.length.toLong }
    val got = Dedup.splitLeakage(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === nVal.keySet)
    got.foreach { case (s, (nv, nl)) =>
      assert(nv === nVal(s), s"val count drifts for source $s")
      assert(nl <= bruteLeak.getOrElse(s, 0L),
        s"source $s reports $nl leaks but brute force finds only " +
          s"${bruteLeak.getOrElse(s, 0L)}")
    }
  }

  test("containment >= jaccard on any shared candidate pair") {
    // |A∩B|/min(|A|,|B|) >= |A∩B|/|A∪B| always.
    val cont = Dedup.containment(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val jac = Dedup.minhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shared = cont.keySet intersect jac.keySet
    assert(shared.nonEmpty)
    shared.foreach(k => assert(cont(k) >= jac(k) - 1e-9, s"$k"))
  }

  test("recall audit scales: 300k synthetic docs with a PINNED-SIZE " +
      "sample, zero storage") {
    // The deployment shape: sample SIZE pinned (mod 100003 → 3 docs
    // here), so the brute-force truth pass stays |sample| × corpus —
    // LINEAR in the corpus. A fixed-rate audit would be quadratic;
    // this smoke runs the shape the Scaladoc prescribes at 100 TB.
    import org.apache.spark.sql.functions.col
    val docs = spark.read.format("graft-synth")
      .option("rows", 300000).option("parts", 16).option("seed", 77)
      .load().select(col("doc_id"), col("text"))
    val out = Dedup.dedupRecallOver(docs, mod = 100003L).collect()
    assert(out.length === 3) // ids 0, 100003, 200006
    out.foreach { r =>
      val (t, h, c) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(h <= t && h <= c, s"caught exceeds bounds: $r")
      assert(r.getLong(4) === (if (t == 0) -1L else 1000000L * h / t))
    }
  }

  test("recall audit: planted exact twin is caught at recall 1e6; " +
      "a sample doc with no near-dups reports -1") {
    import spark.implicits._
    // doc 0 is sampled (0 % RecallMod == 0); its exact twin must be a
    // band candidate (identical sets → identical signatures). doc 97*2
    // is sampled too but shares nothing → n_true = 0 → sentinel.
    val txt = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, txt), (1L, txt),
      (Dedup.RecallMod * 2L, "totally disjoint vocabulary here now"),
      (5L, "other unrelated filler words body content"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupRecallOver(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(0L) === ((1L, 1L, 1L, 1000000L)), s"${out.get(0L)}")
    assert(out(Dedup.RecallMod * 2L)._1 === 0L)
    assert(out(Dedup.RecallMod * 2L)._4 === -1L)
  }

  test("recall audit on the corpus: n_true matches a driver " +
      "brute-force exactly; caught is bounded by truth and scan") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSet))
    val out = Dedup.dedupRecall(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val sample = docs.filter(_._1 % Dedup.RecallMod == 0)
    assert(out.keySet === sample.map(_._1).toSet,
      "one output row per sampled doc, exactly")
    sample.foreach { case (qid, qfs) =>
      val nTrue = docs.count { case (id, fs) =>
        id != qid && 2 * (fs & qfs).size >= (fs ++ qfs).size }
      val (t, h, c, ppm) = out(qid)
      assert(t === nTrue.toLong, s"qid $qid truth drifts: $t vs $nTrue")
      assert(h <= t && h <= c, s"qid $qid: caught $h exceeds bounds")
      assert(ppm === (if (t == 0) -1L else 1000000L * h / t), s"qid $qid")
      // Exact twins always share every band: caught covers them all.
      val nTwin = docs.count { case (id, fs) => id != qid && fs == qfs }
      assert(h >= nTwin.toLong,
        s"qid $qid: $nTwin exact twins but only $h caught")
    }
  }

  test("q_dedup_semantic prunes planted paraphrase clusters that the " +
      "MinHash band path cannot see") {
    import spark.implicits._
    // Paraphrases: near-identical EMBEDDINGS over token-DISJOINT
    // texts. 3 planted clusters of 4 vectors each (base + 3 copies
    // with a tiny deterministic perturbation, cosine >= 0.99) in a
    // 200-vector background spread across directions.
    val dim = graft.operators.Ann.Dim
    def base(seed: Int): Array[Double] =
      Array.tabulate(dim)(d => math.sin(1.0 + seed * 37.0 + d * 0.73))
    def perturb(v: Array[Double], j: Int): Array[Double] =
      v.zipWithIndex.map { case (x, d) => x + 0.0001 * ((d + j) % 7) }
    val background = (0 until 200).map { i =>
      (1000L + i, Array.tabulate(dim)(d =>
        math.cos(i * 2.13 + d * 1.37) + 0.5 * math.sin(i * 0.41 * (d + 1))))
    }
    val planted = (0 until 3).flatMap { cl =>
      val b = base(cl)
      (0 until 4).map(j =>
        (2000L + cl * 10 + j, if (j == 0) b else perturb(b, j)))
    }
    val e = (background ++ planted)
      .map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupOver(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // At the near-identical rung the planted copies are pruned and
    // the min-id survivor kept. One planted cluster can donate TWO
    // md5-ordered quantizer seeds and split across their cells — the
    // SemDeDup cluster-boundary artifact (each sub-cell then keeps
    // its own min) — so the floor is 8, not the ideal 9; measured
    // here: exactly that split occurs and 8 prune. MinHash's floor
    // on the same corpus is 0 (below).
    val (nVecs, pruned99, kept99) = out(990000L)
    assert(nVecs === 212L)
    assert(pruned99 >= 8L,
      s"expected >= 8 planted paraphrases pruned at 0.99, got $pruned99")
    assert(kept99 === nVecs - pruned99)
    // The MinHash band path over token-disjoint texts sees NO
    // candidate pair among planted cluster members: banding hashes
    // token sets, and the paraphrase pairs share no token.
    val texts = (background.map { case (id, _) =>
      (id, s"background doc tok${id}a tok${id}b tok${id}c tok${id}d")
    } ++ planted.map { case (id, _) =>
      (id, s"para doc$id w${id}x w${id}y w${id}z v$id u$id")
    }).toDF("doc_id", "text")
    val cand = Dedup.bandCandidates(Dedup.signature(
        texts.select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokenSet(col("text")))
            .as("f"))))
      .where(col("did_a") >= 2000L && col("did_b") >= 2000L)
      .count()
    assert(cand === 0L,
      "token-disjoint paraphrases must be invisible to MinHash banding")
  }

  test("q_dedup_incremental: stored-serve ≡ inline standing rebuild") {
    // The AnnIndexSpec pattern: the graded row probes the
    // fingerprinted standing rep index; its verdicts must equal the
    // inline form that recomputes the index in-plan, row for row.
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val stored = rows(Dedup.incrementalDedup(spark, sfDir))
    val inline = rows(Dedup.incrementalDedupInline(spark, sfDir))
    assert(stored === inline, "stored probe diverged from inline")
    assert(stored.nonEmpty)
    assert(stored.exists(_._2 == "dup"),
      "fixture must exercise at least one dup verdict")
  }

  test("semantic dedup candidate recall: the within-cell rule's miss " +
      "rate is MEASURED on the clustered manifold") {
    // q_dedup_semantic only compares pairs sharing a quantizer cell —
    // the Σ occupancy² bound that makes SemDeDup linear-ish. The
    // price is pairs ≥ τ that straddle a cell boundary; this is the
    // measurement that says whether the cell dial may be the sole
    // candidate generator (the q_dedup_recall / q_ann_recall
    // discipline applied to the semantic tier). 8k vectors on the
    // 64-center manifold, truth = brute-force cosine ≥ 0.9 pairs.
    import graft.operators.Ann
    import graft.functions.VectorFunctions.cosineSim
    val e = spark.read.format("graft-synth")
      .option("shape", "embeddings")
      .option("rows", 8000).option("parts", 8).option("seed", 7)
      .option("centers", 64).option("sigma", 0.15)
      .load()
      .select(col("vec_id"), col("embedding"))
      .transform(graft.Checkpoints.cut)
    val centArr = broadcast(Ann.asArray(
      Ann.ivfCentroidsOf(e, Dedup.SemCells)))
    val a1 = e.crossJoin(centArr)
      .select(col("vec_id"), col("embedding"),
        graft.plans.NearestCell(col("embedding"), col("cents")).as("cell"),
        Dedup.bridgedCells(col("embedding"), col("cents")).as("c2"))
      .transform(graft.Checkpoints.cut)
    val truth = a1.as("a")
      .join(broadcast(a1.select(col("vec_id").as("bid"),
          col("embedding").as("bemb"), col("cell").as("bcell"),
          col("c2").as("bc2"))),
        col("vec_id") < col("bid"))
      .select(
        (col("cell") === col("bcell")).cast("long").as("co"),
        (size(array_intersect(col("c2"), col("bc2"))) > 0)
          .cast("long").as("cob"),
        cosineSim(col("embedding"), col("bemb")).as("sim"))
      .where(col("sim") >= 0.9)
      .agg(count(lit(1)).as("n"), sum(col("co")).as("co"),
        sum(col("cob")).as("cob"))
      .head()
    val (n, co, cob) = (truth.getLong(0), truth.getLong(1),
      truth.getLong(2))
    val recall = co.toDouble / n
    val recallB = cob.toDouble / n
    // The bridge's candidate-volume price: the measured fraction of
    // vectors the boundary rule actually duplicates (the r10
    // unconditional top-2 rule bridged 100%; the verify volume
    // scales as (1+f)² of the strict rule's).
    val nVec = a1.count()
    val nBridged = a1.where(size(col("c2")) === 2).count()
    val frac = nBridged.toDouble / nVec
    info(f"true cosine>=0.9 pairs: $n, co-celled: $co " +
      f"(recall $recall%.3f), boundary-bridged: $cob " +
      f"(recall $recallB%.3f, bridged fraction $frac%.3f)")
    assert(n >= 1000L, s"manifold must contain near-dup pairs, got $n")
    assert(recall >= 0.8,
      f"within-cell candidate recall $recall%.3f below the 0.8 bar — " +
        "the cell dial alone would miss too many semantic dups")
    // The bridge rung exists to close the boundary miss: on this
    // manifold the boundary rule must recover ALL of it (measured
    // 0.936 strict -> 1.000 bridged), at a fraction of the
    // unconditional top-2 rule's volume.
    assert(recallB >= recall, "bridging can only add candidates")
    assert(recallB >= 0.999,
      f"bridged candidate recall $recallB%.3f below the 1.000 bar")
    assert(frac < 0.8,
      f"boundary rule bridged $frac%.3f of vectors — not selective; " +
        "the unconditional top-2 rule would be cheaper to reason about")
  }

  test("SemDeDup cell dial at scale: cells ∝ n keeps the candidate " +
      "volume LINEAR (1M-vector zero-storage smoke)") {
    // The graded rows run SemCells = 64 at gate SFs; the docstring's
    // 100 TB claim is that a deployment scales the CELL COUNT with
    // the corpus (target occupancy ~constant), which keeps the
    // within-cell verify volume Σ occ·(occ−1)/2 ≈ n·occ/2 — linear
    // in n, never corpus-quadratic. This smoke PROVES the dial:
    // half a million vs a million synthetic vectors, cells 512 vs
    // 1024 (target occupancy ~1k both), assignment + occupancy
    // census end to end, no storage.
    //
    // Assignment is the TWO-LEVEL coarse→fine argmin, because the
    // smoke's first run exposed the one-level cost model honestly:
    // n·cells flops is QUADRATIC when cells ∝ n (measured 4.0x
    // wall-time for 2x data — the quantizer, not the census, was
    // the bottleneck). Hierarchy bounds per-row work by the level
    // fan-outs (32 coarse + cells/32 fine here); the general rule a
    // deployment applies is fan-out-F levels (per-row cost
    // F·log_F(cells) = O(log n)) or, at the extreme, serving the
    // CENTROID SET itself from the graph index (q_ann_graph's beam
    // probe — per-row cost independent of cell count, the SPANN
    // shape). The census semantics never change: a cell is a cell
    // whoever assigned it.
    import graft.operators.Ann
    import org.apache.spark.sql.expressions.Window
    def synth(n: Int, parts: Int) = spark.read.format("graft-synth")
      .option("shape", "embeddings")
      .option("rows", n).option("parts", parts).option("seed", 11)
      .option("centers", 64).option("sigma", 0.15)
      .load().select(col("vec_id"), col("embedding"))
    val coarseN = 32
    def run(n: Int, cells: Int): (Double, Long, Long) = {
      val e = synth(n, 16).transform(graft.Checkpoints.cut)
      val t0 = System.nanoTime()
      val cArr = broadcast(Ann.asArray(Ann.ivfCentroidsOf(e, coarseN)))
      val ec = e.crossJoin(cArr)
        .select(col("vec_id"), col("embedding"),
          graft.plans.NearestCell(col("embedding"), col("cents")).as("g"))
      // Fine seeds: the md5-first (cells/coarseN) members of each
      // coarse group (the ivfCentroidsOf seed rule, segmented).
      val wG = Window.partitionBy(col("g"))
        .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
      val fArr = ec.withColumn("rk", row_number().over(wG))
        .where(col("rk") <= cells / coarseN)
        .groupBy(col("g"))
        .agg(sort_array(collect_list(struct(col("vec_id").as("cid"),
          col("embedding").as("cvec")))).as("fcents"))
      val occ = ec.join(broadcast(fArr), Seq("g"))
        .select(graft.plans.NearestCell(col("embedding"), col("fcents"))
          .as("cell"))
        .groupBy(col("cell")).count()
        .agg(sum(expr("count * (count - 1) DIV 2")).as("cand"),
          max(col("count")).as("mx"))
        .head()
      val dt = (System.nanoTime() - t0) / 1e9
      (dt, occ.getLong(0), occ.getLong(1))
    }
    run(50000, 512) // warm the codegen/shuffle path off the clock
    val (t1, v1, m1) = run(500000, 512)
    val (t2, v2, m2) = run(1000000, 1024)
    info(f"500k/512c: ${t1}%.1f s, $v1 cand pairs, max occ $m1; " +
      f"1M/1024c: ${t2}%.1f s, $v2 cand pairs, max occ $m2")
    val vRatio = v2.toDouble / v1
    assert(vRatio < 2.6,
      f"candidate volume grew ${vRatio}%.2f x for 2x data — the cell " +
        "dial is not holding occupancy")
    // The wall-clock ratio is load/GC-sensitive on contended hosts, so
    // the CORRECTNESS suite only logs it; the candidate-volume ratio
    // above is the deterministic envelope. Export GRAFT_TIMING_ASSERTS
    // to make the ratio a hard gate (local perf iteration).
    if (sys.env.contains("GRAFT_TIMING_ASSERTS"))
      assert(t2 / t1 < 3.0,
        f"wall-time grew ${t2 / t1}%.2f x for 2x data (the one-level " +
          "quadratic envelope is 4x) — assignment or census regressed")
    else info(f"wall ratio 2x data: ${t2 / t1}%.2f x (quadratic " +
      "envelope 4x; assertion gated behind GRAFT_TIMING_ASSERTS)")
  }
}
