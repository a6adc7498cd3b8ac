package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}

/** Invariants of the curation operators: hash-sampling determinism,
  * histogram completeness, TF-IDF ranking shape, cluster label
  * properties.
  */
class CurationSpec extends SparkSuite {

  test("q_sample_pps: K boundaries all land, multiplicities exact, " +
      "segmented prefix == naive driver recomputation") {
    val got = Curation.samplePps(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.map(_._4).sum === Curation.PpsK,
      "every sampling boundary lands in exactly one doc interval")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val total = docs.map(_._2).sum
    var cum = 0L
    val want = docs.flatMap { case (id, w) =>
      val lo = cum * Curation.PpsK / total
      cum += w
      val hi = cum * Curation.PpsK / total
      if (hi > lo) Some((id, w, cum - w, hi - lo)) else None
    }
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("stratified sample is deterministic and rate-configured") {
    val a = Curation.sampleStratified(spark, sfDir).collect()
    val b = Curation.sampleStratified(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    a.foreach { r =>
      val (src, rate, total, kept) =
        (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))
      val n = src.stripPrefix("src").toInt
      assert(rate === (n % 4 + 1) * 10, src)
      assert(kept >= 0 && kept <= total)
    }
  }

  test("quality histogram covers every document exactly once") {
    val total = Tables.documents(spark, sfDir).count()
    val hist = Curation.qualityHistogram(spark, sfDir).collect()
    assert(hist.map(_.getLong(1)).sum === total)
    hist.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 9)
      assert(r.getDouble(2) <= r.getDouble(3) + 1e-9) // min_q <= avg_q
      assert(r.getDouble(3) <= r.getDouble(4) + 1e-9) // avg_q <= max_q
    }
  }

  test("tfidf emits at most 3 ranked terms per doc, scores descending") {
    val rows = Curation.tfidfTopTerms(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(5)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length))
      assert(sorted.length <= 3)
      sorted.sliding(2).foreach {
        case Array(hi, lo) => assert(hi._3 >= lo._3 - 1e-9)
        case _ =>
      }
    }
  }

  test("sequence packing partitions every doc into exactly one bin") {
    val docs = Tables.documents(spark, sfDir)
    val total = docs.count()
    val toksTotal = docs
      .select(size(split(col("text"), " ")).cast("long").as("tk"))
      .agg(sum(col("tk"))).head().getLong(0)
    val bins = Curation.packSequences(spark, sfDir).collect()
    assert(bins.map(_.getLong(3)).sum === total) // n_docs sums to corpus
    assert(bins.map(_.getLong(4)).sum === toksTotal) // tokens conserved
    // Within a (source, shard), bins are contiguous doc-id ranges.
    bins.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(2))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(6) < b.getLong(5))
        case _ =>
      }
    }
    // Sharding spreads the packing: every source occupies >1 shard
    // (the r5 weak plan serialized each source through one task).
    val shardsPerSource = bins.groupBy(_.getString(0))
      .map { case (_, rs) => rs.map(_.getLong(1)).distinct.length }
    assert(shardsPerSource.forall(_ > 1),
      s"expected multi-shard packing per source: $shardsPerSource")
  }

  test("contamination pairs share at least the threshold of shingles") {
    val rows = Curation.contamination(spark, sfDir).collect()
    assert(rows.forall(_.getLong(2) >= 2))
    assert(rows.forall(r => r.getLong(0) >= 10 && r.getLong(1) < 10))
  }

  test("bloom pre-join prune leaves the contamination answer unchanged") {
    // The sketch tier composing into a pipeline query: the Bloom
    // prefilter may only DROP rows the exact join would drop anyway
    // (no false negatives by construction). Equality against the
    // plain exact-join formulation proves it end to end.
    import graft.functions.TextFunctions.wordShingles
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(wordShingles(col("text"), 3)).as("sng"))
    val test = sh.where(col("doc_id") < 10)
      .select(col("doc_id").as("test_id"), col("sng"))
    val plain = sh.where(col("doc_id") >= 10)
      .join(broadcast(test), Seq("sng"))
      .groupBy(col("doc_id"), col("test_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= 2)
      .orderBy(col("n_shared").desc, col("doc_id").asc, col("test_id").asc)
      .collect().toSeq
    val pruned = Curation.contamination(spark, sfDir).collect().toSeq
    assert(pruned === plain)
  }

  test("capstone pipeline scales: 10M synth docs, zero storage") {
    // The composed pipeline (dedup winners -> quality gate -> sample
    // -> sharded packing -> rollup) driven through the graft-synth
    // connector at 10M rows: a quadratic candidate blowup or a
    // serialized pack window would not survive this size. Asserts
    // completion plus conservation (docs kept <= generated, tokens
    // consistent with bins).
    val docs = spark.read.format("graft-synth")
      .option("rows", 10000000).option("parts", 32).option("seed", 11)
      .load()
    val rows = Curation.pipelineOver(docs).collect()
    assert(rows.nonEmpty)
    val nDocs = rows.map(_.getLong(1)).sum
    val nBins = rows.map(_.getLong(2)).sum
    val toks = rows.map(_.getLong(3)).sum
    info(s"kept $nDocs docs, $nBins bins, $toks tokens across " +
      s"${rows.length} sources")
    assert(nDocs > 0 && nDocs <= 10000000L)
    assert(nBins > 0 && nBins <= nDocs)
    assert(toks >= nDocs) // every kept doc has >= 1 token
  }

  test("chunk_text: stride-prefixes reconstruct every doc; no hash exchange") {
    import graft.operators.TextAnalysis.{ChunkStride, ChunkWindow}
    val df = graft.operators.TextAnalysis.chunkText(spark, sfDir)
    val chunks = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .groupBy(_._1)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    assert(chunks.keySet === docs.keySet) // every doc chunks
    docs.foreach { case (id, toks) =>
      val cs = chunks(id).sortBy(_._2)
      // starts stride-spaced from 0; windows full except the tail
      cs.zipWithIndex.foreach { case ((_, cid, start, n, text), i) =>
        assert(cid === i.toLong)
        assert(start === i.toLong * ChunkStride)
        assert(n === math.min(ChunkWindow.toLong, toks.size - start))
        assert(text === toks.slice(start.toInt,
          start.toInt + ChunkWindow).mkString(" "))
      }
      // the first `stride` tokens of each chunk plus the final
      // chunk's tail reconstruct the doc exactly — no boundary loss
      val rebuilt = cs.init.flatMap(
        _._5.split(" ", -1).take(ChunkStride)) ++
        cs.last._5.split(" ", -1)
      assert(rebuilt.toSeq === toks, s"doc $id")
    }
    // the transform is map-only: the one exchange is the output sort
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"), plan.take(800))
  }

  test("lm_score matches a full independent recomputation") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val bgs = docs.map { case (id, t) => id -> t.zip(t.drop(1)) }
    val c2 = bgs.flatMap(_._2).groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> m.values.sum }
    val ppm = c2.map { case (bg, c) =>
      bg -> math.round(1e6 * c / c1(bg._1)) }
    val want = bgs.filter(_._2.nonEmpty).map { case (id, bg) =>
      val sp = bg.map(ppm).sum
      val n = bg.size.toLong
      (id, n, (2 * sp + n) / (2 * n),
        if (sp * 50 < n * 1000000L) 1L else 0L)
    }.sortBy(_._1).toSeq
    val got = Curation.lmScore(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === want)
  }

  test("lm_score reuses the bigram exchange in the shuffle-join regime") {
    // With broadcasts off and AQE's runtime re-planning disabled —
    // the plan shape a 100 TB corpus forces — the model build and
    // the scoring probe must share ONE bigram exchange on (w1, w2).
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Curation.lmScore(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"), plan.take(1200))
      // and the shuffle-join plan is value-identical to the default
      val got = df.collect().map(_.toSeq).toSeq
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
      val want = Curation.lmScore(spark, sfDir).collect().map(_.toSeq).toSeq
      assert(got === want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("filter_funnel is cumulative and matches a per-doc recomputation") {
    import graft.operators.TextAnalysis.StopwordSets
    val rows = Curation.filterFunnel(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    rows.foreach { case (_, n, s1, s2, s3, s4, s5) =>
      assert(n >= s1 && s1 >= s2 && s2 >= s3 && s3 >= s4 && s4 >= s5)
    }
    // independent driver-side recomputation of every stage
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val fpOf = docs.map { case (id, _, text) =>
      val norm = text.toLowerCase.replaceAll("[^a-z0-9 ]", "")
        .replaceAll(" +", " ").trim
      id -> md5hex(norm)
    }.toMap
    val rep = fpOf.groupBy(_._2).map { case (fp, m) => fp -> m.keys.min }
    val want = docs.map { case (id, src, text) =>
      val toks = text.split(" ", -1).toSeq
      val hits = StopwordSets.map { case (_, ws) =>
        toks.count(ws.contains) }
      val n = toks.size.toLong
      val nd = toks.distinct.size.toLong
      val best = toks.groupBy(identity).values.map(_.size).max.toLong
      val flags = Seq(
        hits.tail.forall(hits.head >= _) && hits.head > 0,
        n >= 10L && n <= 1000L,
        nd * 10 >= n * 3,
        best * 5 <= n,
        rep(fpOf(id)) == id)
      val cum = flags.scanLeft(true)(_ && _).tail
      (src, cum)
    }.groupBy(_._1).map { case (src, ds) =>
      (src, ds.size.toLong,
        ds.count(_._2(0)).toLong, ds.count(_._2(1)).toLong,
        ds.count(_._2(2)).toLong, ds.count(_._2(3)).toLong,
        ds.count(_._2(4)).toLong)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq === want)
  }

  test("10M synth docs through the chunker, zero storage, zero exchanges") {
    import graft.operators.TextAnalysis
    val docs = spark.read.format("graft-synth")
      .option("rows", 10000000).option("parts", 32).option("seed", 13)
      .load()
    val chunks = TextAnalysis.chunkTextOver(docs)
    // the transform plan has NO exchange at all — it composes into
    // a 100 TB embed stage without repartitioning the corpus
    assert(!chunks.queryExecution.executedPlan.toString
      .contains("Exchange"))
    val n = chunks.count()
    val expected = docs
      .select(ceil(size(split(col("text"), " ")).cast("double") /
        TextAnalysis.ChunkStride).cast("long").as("c"))
      .agg(sum(col("c"))).collect()(0).getLong(0)
    info(s"$n chunks from 10M docs (expected $expected)")
    assert(n === expected)
  }

  test("1M synth docs through the bigram-LM scorer, zero storage") {
    val docs = spark.read.format("graft-synth")
      .option("rows", 1000000).option("parts", 32).option("seed", 17)
      .load()
    val rows = Curation.lmScoreOver(docs)
    val stats = rows.agg(
      count(lit(1)), sum(col("flagged")),
      min(col("avg_ppm")), max(col("avg_ppm"))).collect()(0)
    val (n, flagged) = (stats.getLong(0), stats.getLong(1))
    info(s"$n docs scored, $flagged flagged, " +
      s"avg_ppm in [${stats.getLong(2)}, ${stats.getLong(3)}]")
    assert(n === 1000000L) // every doc has >= 2 tokens -> scored
    assert(stats.getLong(2) >= 0L && stats.getLong(3) <= 1000000L)
    assert(flagged < n) // the corpus cannot be all-outlier vs itself
  }

  test("5M synth docs through the filter funnel, zero storage") {
    // The funnel is one map-only flag projection + a fp-keyed rep
    // join + a ~20-key rollup; at 5M rows a per-stage re-scan or an
    // unkeyed rep join would show immediately. Asserts the funnel's
    // defining invariant: stage counts are monotone non-increasing.
    val docs = spark.read.format("graft-synth")
      .option("rows", 5000000).option("parts", 32).option("seed", 19)
      .load()
    val rows = Curation.filterFunnelOver(docs).collect()
    assert(rows.nonEmpty)
    val nDocs = rows.map(_.getLong(1)).sum
    assert(nDocs === 5000000L)
    rows.foreach { r =>
      val chain = (1 to 6).map(r.getLong) // n_docs then 5 cumulative stages
      assert(chain.zip(chain.tail).forall { case (a, b) => a >= b },
        s"funnel not monotone for ${r.getString(0)}: $chain")
      assert(chain.last >= 0L)
    }
    info(rows.map(r => s"${r.getString(0)}: " +
      (1 to 6).map(r.getLong).mkString(">=")).mkString("; "))
  }

  test("shard shuffle: conserves the corpus, interleaves sources, rand()-free") {
    val docs = Tables.documents(spark, sfDir)
    val rows = Curation.shardShuffle(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq ===
      rows.map(_.getLong(0)).sorted.toSeq)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    assert(rows.forall(r => r.getLong(0) >= 0 &&
      r.getLong(0) < Curation.ShuffleShards))
    // conservation: every doc and every token lands in exactly one shard
    assert(rows.map(_.getLong(1)).sum === docs.count())
    val totalToks = docs
      .agg(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(3)).sum === totalToks)
    // the point of the shuffle: every shard is a source MIX, not a
    // source-contiguous slice (20 sources over 8 shards)
    assert(rows.forall(_.getLong(2) > 1))
    assert(rows.forall(r => r.getLong(4) <= r.getLong(5)))
    // deterministic: a rerun is byte-identical (no rand() anywhere)
    assert(Curation.shardShuffle(spark, sfDir).collect().toSeq === rows.toSeq)
  }

  test("cluster sizes are positive, ordered, and bounded by the corpus") {
    val total = Tables.documents(spark, sfDir).count()
    val cl = Dedup.dedupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cl.map(_._2).sum <= total)
    assert(cl.forall(_._2 >= 1))
    cl.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      case _ =>
    }
  }

  test("seed-centroid quality matches a driver-side recomputation " +
      "and ranks the seed source first") {
    import org.apache.spark.sql.functions._
    // Full independent recompute: centroid from micro-int sums, then
    // per-source cosine stats — catches a wrong join side, a
    // drifting fixed-point path, or an order-dependent mean. The
    // semantic sanity: the curated slice itself must score highest,
    // or the prototype carries no signal.
    val src = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .filter(v => src.contains(v._1))
    val seed = vecs.filter(v => src(v._1) == Curation.SeedSource)
    assert(seed.nonEmpty)
    val micro = seed.map(_._2.map(x => math.round(x * 1e6)))
    val cent = (0 until 64).map(i =>
      micro.map(_(i)).sum.toDouble / seed.length / 1e6).toArray
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < 64) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val bySrc = vecs.groupBy(v => src(v._1))
    val expected = bySrc.map { case (s, vs) =>
      val sims = vs.map(v => cos(v._2, cent))
      val avg = sims.map(x => math.round(x * 1e6)).sum.toDouble /
        sims.length / 1e6
      s -> ((vs.length.toLong, avg, sims.min, sims.max))
    }
    val got = Curation.seedQuality(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (s, (n, avg, mn, mx)) =>
      val (en, eavg, emn, emx) = expected(s)
      assert(n === en, s"count drifts for $s")
      assert(math.abs(avg - eavg) < 2e-6, s"avg drifts for $s")
      assert(math.abs(mn - emn) < 2e-6 && math.abs(mx - emx) < 2e-6,
        s"min/max drift for $s")
    }
    val best = got.maxBy(_._2._2)._1
    assert(best === Curation.SeedSource,
      s"the curated slice must score highest, got $best")
  }

  test("bpe pairs: vocab-weighted counting equals the token-stream scan") {
    // The scale claim is that enumerating pairs over DISTINCT words
    // weighted by frequency loses nothing vs the naive pass over
    // every token occurrence — prove count-for-count equality.
    import graft.functions.TextFunctions.tokens
    val fast = Curation.bpePairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val naive = Tables.documents(spark, sfDir)
      .select(explode(tokens(col("text"))).as("w"))
      .where(length(col("w")) >= 2)
      .select(explode(Curation.charPairs(col("w"))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(fast === naive)
    assert(fast.map(_._2).sliding(2).forall(p => p.head >= p.last),
      "merge candidates must rank by descending count")
  }

  test("bpe pairs: 2M synth docs, zero storage") {
    // The vocab-first shape at a size where shuffling the raw token
    // stream into the pair count would dominate: the pair shuffle
    // carries O(vocab × word_len) rows regardless of corpus size.
    val docs = spark.read.format("graft-synth")
      .option("rows", 2000000).option("parts", 32).option("seed", 23)
      .load()
    val rows = Curation.bpePairsOver(docs).collect()
    assert(rows.length === 20)
    info(s"top pair '${rows.head.getString(0)}' × ${rows.head.getLong(1)}")
    assert(rows.head.getLong(1) > 2000000L,
      "top pair of a 2M-doc corpus must occur more than once per doc on average")
  }

  test("bpe apply: learned merges conserve tokens and shrink the corpus") {
    import graft.functions.TextFunctions.tokens
    val rows = Curation.bpeApply(spark, sfDir).collect()
    assert(rows.length === Curation.BpeSteps)
    // The starting corpus token total (every word is len(w) chars).
    val before = Tables.documents(spark, sfDir)
      .select(explode(tokens(col("text"))).as("w"))
      .agg(sum(length(col("w")))).collect()(0).getLong(0)
    var prev = before
    rows.foreach { r =>
      val (l, rr) = (r.getAs[String]("lhs"), r.getAs[String]("rhs"))
      val cnt = r.getAs[Long]("pair_count")
      val after = r.getAs[Long]("corpus_tokens_after")
      assert(after < prev, s"step ${r.getAs[Int]("step")} must shrink")
      // For a non-self pair, occurrences cannot overlap, so every
      // counted pair merges: exact token conservation.
      if (l != rr) assert(after === prev - cnt,
        s"step ${r.getAs[Int]("step")}: $prev - $cnt != $after")
      prev = after
    }
    // Reruns learn the identical merge table (driver-loop determinism).
    val again = Curation.bpeApply(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("collocations: lift matches an exact driver-side recomputation") {
    import graft.functions.TextFunctions.tokens
    val got = Curation.collocations(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got.size === 20)
    // Recompute counts and the wide-integer lift in plain Scala.
    val docs = Tables.documents(spark, sfDir)
      .select(tokens(col("text")).as("ts")).collect()
      .map(_.getSeq[String](0)).toSeq
    val uni = docs.flatten.groupBy(identity).map { case (w, xs) =>
      w -> xs.size.toLong }
    val prs = docs.flatMap(ts => ts.zip(ts.tail))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val nt = BigInt(uni.values.sum)
    val np = BigInt(prs.values.sum)
    got.foreach { case (w1, w2, cab, lift) =>
      assert(prs((w1, w2)) === cab)
      assert(cab >= Curation.CoocMinPair)
      val num = BigInt(1000000) * cab * nt * nt
      val den = np * uni(w1) * uni(w2)
      assert(BigInt(lift) === (2 * num + den) / (2 * den),
        s"($w1,$w2) lift mismatch")
    }
    // Top collocations must be POSITIVE associations (lift > 1).
    assert(got.head._4 > 1000000L)
  }

  test("skipgrams: counts match a driver-side window scan and are " +
      "direction-symmetric") {
    import graft.functions.TextFunctions.tokens
    val full = Curation.skipgramCounts(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // Exact recomputation: every position pairs with neighbors at
    // offsets ±1..±window.
    val docs = Tables.documents(spark, sfDir)
      .select(tokens(col("text")).as("ts")).collect()
      .map(_.getSeq[String](0)).toSeq
    val want = docs.flatMap { ts =>
      for {
        i <- ts.indices
        d <- 1 to Curation.SkipgramWindow
        j <- Seq(i - d, i + d) if j >= 0 && j < ts.size
      } yield (ts(i), ts(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    assert(full === want)
    // The multiset is symmetric by construction: cnt(a,b) == cnt(b,a).
    full.foreach { case ((a, b), c) => assert(full((b, a)) === c) }
    // The registered row is the deterministic top-50 cut of it.
    val got = Curation.skipgrams(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got.size === 50)
    val sorted = full.toSeq.map { case ((a, b), c) => (a, b, c) }
      .sortBy { case (a, b, c) => (-c, a, b) }.take(50)
    assert(got === sorted)
  }

  test("dsir: target slice scores highest on average; mean is exact") {
    val imp = Curation.dsirWeights(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val srcOf = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (seed, rest) = imp.partition(t => srcOf(t._1) == Curation.SeedSource)
    def mean(xs: Seq[(Long, Long, Long)]) =
      xs.map(_._3).sum.toDouble / xs.length
    assert(mean(seed) > mean(rest),
      s"target docs must weigh heavier: seed=${mean(seed)} rest=${mean(rest)}")
    // The importance mean is the exact round-half-up of the per-token
    // micro-ratio sum — recompute one doc driver-side from the
    // broadcast-joined parts is overkill; instead pin the invariant
    // that every weight is a plausible integer ppm.
    imp.foreach { case (id, n, w) =>
      assert(n > 0 && w > 0, s"doc $id: n=$n imp=$w")
    }
  }

  test("q_dsir_sample: the accepted set is exactly the hash-Bernoulli " +
      "draw over q_dsir's weights; certain-keeps always kept") {
    val weights = Curation.dsirWeights(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = Curation.dsirSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // Driver-side recomputation of the draw from the weights row set:
    // keep iff hash60("dsirs:"+id) mod 1e6 < min(imp_ppm, 1e6).
    val want = weights.filter { case (id, _, w) =>
      graft.functions.MinHash.hash60Local(s"dsirs:$id") % 1000000L <
        math.min(w, 1000000L)
    }
    assert(got.nonEmpty && got.size < weights.size,
      s"draw must be a proper subset: ${got.size} of ${weights.size}")
    assert(got.toSet === want.toSet, "accepted set drifted from the draw")
    // Weights >= 1e6 are certain keeps (importance resampling never
    // drops a doc more target-like than the proposal).
    val certain = weights.collect { case (id, _, w) if w >= 1000000L => id }
    val kept = got.map(_._1).toSet
    certain.foreach(id => assert(kept(id), s"certain-keep doc $id dropped"))
  }

  test("dsir: 1M synth docs, zero storage") {
    // The scoring pass at a size where a shuffle-joined token stream
    // or an unbroadcast ratio table would dominate: every doc gets a
    // weight, all weights are positive integer ppm.
    val docs = spark.read.format("graft-synth")
      .option("rows", 1000000).option("parts", 32).option("seed", 29)
      .load()
    val stats = Curation.dsirWeightsOver(docs)
      .agg(count(lit(1)), min(col("imp_ppm")), max(col("imp_ppm")),
        sum(col("keep"))).collect()(0)
    info(s"${stats.getLong(0)} docs, imp in [${stats.getLong(1)}, " +
      s"${stats.getLong(2)}], ${stats.getLong(3)} kept")
    assert(stats.getLong(0) === 1000000L)
    assert(stats.getLong(1) > 0L)
  }

  test("q_source_drift: exact driver-side TV recomputation over the " +
      "full vocab (absent tokens included)") {
    val got = Curation.sourceDrift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val toks = Tables.documents(spark, sfDir)
      .selectExpr("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(r.getString(0) -> _))
    val corpus = toks.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val tt = toks.length.toLong
    val want = toks.groupBy(_._1).map { case (src, xs) =>
      val cs = xs.groupBy(_._2).map { case (t, ys) => t -> ys.length.toLong }
      val tsrc = xs.length.toLong
      // The brute-force definition: sum over the ENTIRE corpus vocab,
      // including tokens the source never emits.
      val num = corpus.map { case (t, c) =>
        (BigInt(cs.getOrElse(t, 0L)) * tt - BigInt(c) * tsrc).abs
      }.sum
      val den = BigInt(2) * tsrc * tt
      (src, tsrc, cs.size.toLong,
        ((BigInt(2) * 1000000 * num + den) / (den * 2)).toLong)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq === want)
    // TV is a [0, 1e6] metric and the synthetic sources do differ.
    assert(got.forall(r => r._4 >= 0 && r._4 <= 1000000L))
    assert(got.map(_._4).max > 0L)
  }

  test("mix_temp: temperature flattens the mix monotonically") {
    val rows = Curation.mixTempered(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // Rounded per-source probabilities each sum to ~1.
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    // sqrt is concave: a smaller source never gets a smaller boost.
    val bySize = rows.sortBy(_._2)
    bySize.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 >= b._5 - 1e-9,
        s"boost must be non-increasing in size: $a vs $b")
      case _ => ()
    }
  }
}
