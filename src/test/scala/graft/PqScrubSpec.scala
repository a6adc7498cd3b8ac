package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, TextAnalysis}

/** Round-5 operators: product-quantization ADC recall audit,
  * denylist redaction scrub, repetition quality signals. */
class PqScrubSpec extends SparkSuite {

  test("q_ann_pq: recall row is well-formed and deterministic") {
    val r = Ann.pqRecall(spark, sfDir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(0) === 10L) // k
    assert(row.getLong(1) === 10L) // n_brute
    val hits = row.getLong(2)
    assert(hits >= 0L && hits <= 10L)
    assert(row.getDouble(3) === hits.toDouble / 10.0)
    // Deterministic end to end (codebook, codes, ADC, tie-breaks).
    assert(Ann.pqRecall(spark, sfDir).collect().toSeq === r.toSeq)
  }

  test("q_ann_pq: encode/ADC plan is broadcast-only (no corpus shuffle)") {
    val plan = Ann.pqRecall(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"PQ must never sort-merge the corpus:\n$plan")
  }

  test("scrub regex semantics: word-anchored, all occurrences, masked") {
    import spark.implicits._
    val pat = TextAnalysis.Denylist.mkString("\\b(", "|", ")\\b")
    val df = Seq(
      ("key of the customer key", 3L),   // repeats all count
      ("keys monkey", 0L),               // \b blocks partial matches
      ("value", 1L),
      ("nothing here", 0L))
      .toDF("text", "want")
      .select(col("want"),
        regexp_count(col("text"), lit(pat)).as("got"),
        regexp_replace(col("text"), pat, "[MASKED]").as("scrubbed"))
    val re = pat.r
    df.collect().foreach { r =>
      assert(r.getAs[Long]("got") === r.getAs[Long]("want"))
      assert(re.findFirstIn(r.getAs[String]("scrubbed")).isEmpty,
        s"scrubbed text still matches: ${r.getAs[String]("scrubbed")}")
    }
  }

  test("q_scrub_denylist: audit accounting is internally consistent") {
    val rows = TextAnalysis.scrubDenylist(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, touched, red) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(touched <= nDocs)
      assert(red >= touched) // every touched doc has ≥1 redaction
    }
    // The corpus genuinely exercises the scrub path.
    assert(rows.map(_.getLong(3)).sum > 0L, "denylist never fired")
  }

  test("maxWordFreq run-length fold == explode/groupBy max, every doc") {
    import graft.functions.TextFunctions.tokens
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val folded = docs.select(col("doc_id"),
      TextAnalysis.maxWordFreq(col("toks")).as("best"))
    val exploded = docs.select(col("doc_id"), explode(col("toks")).as("t"))
      .groupBy(col("doc_id"), col("t")).count()
      .groupBy(col("doc_id")).agg(max(col("count")).as("best"))
    assert(folded.join(exploded, Seq("doc_id"))
      .where(folded("best") =!= exploded("best")).count() === 0L)
  }

  test("q_salted_join: salt reaches the join key; answer == plain join") {
    val salted = graft.operators.Relational.saltedJoinAgg(spark, sfDir)
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), s"join must key on the salt:\n$p")
    val plain = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .join(Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        Seq("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
      .orderBy(col("c_mktsegment").asc)
    assert(salted.collect().toSeq === plain.collect().toSeq)
  }

  test("q_scd2: per-key intervals chain without gaps or overlaps") {
    val rows = graft.operators.Temporal.scd2(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getLong(0), r.getString(1))).foreach {
      case (_, vs) =>
        val sorted = vs.sortBy(_.getLong(3))
        // exactly one open (latest) version per key
        assert(sorted.count(_.isNullAt(4)) === 1)
        assert(sorted.last.isNullAt(4))
        // each version closes exactly where the next one opens
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a.getLong(4) === b.getLong(3))
          case _ => ()
        }
    }
  }

  test("q_vocab_cov: OOV path exercised, rates consistent with counts") {
    val rows = graft.operators.Curation.vocabCoverage(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, oov, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(oov >= 0L && oov <= n)
      assert(math.abs(rate - oov.toDouble / n) < 1e-6)
    }
    // K < vocabulary size, so OOV must genuinely occur somewhere.
    assert(rows.map(_.getLong(2)).sum > 0L, "OOV never fired — K too big")
  }

  test("q_mmr: objective non-increasing and measurably more diverse than top-k") {
    import graft.functions.VectorFunctions.cosineSim
    val sel = graft.operators.Rerank.mmr(spark, sfDir).collect()
    assert(sel.length === 5)
    // Greedy MMR objective can only fall: each step maximizes over a
    // smaller candidate set with at least as much penalty.
    sel.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(2) >= b.getDouble(2) - 1e-9)
      case _ => ()
    }
    // Diversity: mean pairwise similarity of the MMR set must not
    // exceed that of the pure relevance top-5 (that's the point).
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    def meanPairSim(ids: Seq[Long]): Double = {
      val vs = e.where(col("vec_id").isin(ids: _*))
        .select(col("vec_id").as("ia"), col("embedding").as("va"))
      val vs2 = vs.select(col("ia").as("ib"), col("va").as("vb"))
      vs.crossJoin(vs2).where(col("ia") < col("ib"))
        .agg(avg(cosineSim(col("va"), col("vb")))).head().getDouble(0)
    }
    val top5 = e.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), cosineSim(col("embedding"), col("qvec")).as("s"))
      .orderBy(col("s").desc, col("vec_id").asc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    val mmrIds = sel.map(_.getLong(1)).toSeq
    assert(meanPairSim(mmrIds) <= meanPairSim(top5) + 1e-9,
      "MMR set is not more diverse than the pure top-k")
  }

  test("q_repetition: pooled fractions bounded and flags consistent") {
    val rows = TextAnalysis.repetition(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dup = r.getDouble(3)
      val top = r.getDouble(4)
      assert(dup >= 0.0 && dup < 1.0)
      assert(top > 0.0 && top <= 1.0)
      assert(r.getLong(5) <= r.getLong(1)) // n_flagged ≤ n_docs
    }
  }

  test("q_entropy: exact fixed-point recomputation; bounds and flag " +
      "non-vacuous") {
    val got = TextAnalysis.entropy(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
    // Spark's round(double, 0): HALF_UP over the decimal rendering
    // (BigDecimal.valueOf), not Math.round's floor(x + .5).
    def r0(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val want = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ", -1).toSeq
        val n = toks.length.toLong
        val cs = toks.groupBy(identity).map(_._2.size.toLong).toSeq
        val su = cs.map(c => r0(1e6 * c * math.log(c.toDouble) / n)).sum
        val ent = r0(1e6 * math.log(n.toDouble)) - su
        val vocab = cs.size.toLong
        val lnv = r0(1e6 * math.log(vocab.toDouble))
        val norm = if (vocab == 1) 0L else (2 * 1000000L * ent + lnv) /
          (2 * lnv)
        (r.getLong(0), (n, vocab, ent, norm,
          if (norm < TextAnalysis.LowEntPpm) 1L else 0L))
      }.sortBy(_._1).toSeq
    assert(got.toSeq === want)
    // Entropy bounds under the fixed-point scheme: H ∈ [0, ln vocab]
    // up to sub-unat rounding, and both flag classes are populated
    // (the signal separates docs at this corpus).
    got.foreach { case (id, (_, vocab, ent, norm, _)) =>
      assert(ent >= 0L, s"doc $id: negative entropy $ent")
      assert(norm <= 1000001L, s"doc $id: norm $norm above max")
      assert(vocab > 1 || ent == 0L, s"doc $id: vocab=1 must be H=0")
    }
    assert(got.exists(_._2._5 == 1L), "no low-entropy doc flagged")
    assert(got.exists(_._2._5 == 0L), "every doc flagged")
  }

  test("q_redundancy: exact driver-side recomputation of the " +
      "duplicate-ngram ladder") {
    val got = TextAnalysis.redundancy(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).toSeq))
    val want = (for ((w, th) <- Seq(2 -> 80000L, 3 -> 40000L);
        (src, ds) <- docs.groupBy(_._1)) yield {
      val reds = ds.map { case (_, t) =>
        val n = math.max(t.length - (w - 1), 0).toLong
        val d = t.sliding(w).filter(_.length == w).map(_.mkString(" "))
          .toSet.size.toLong
        val m = math.max(n, 1L)
        (2L * 1000000L * (n - d) + m) / (2L * m)
      }
      val cnt = reds.length.toLong
      ((src, w.toLong), (cnt, (2L * reds.sum + cnt) / (2L * cnt),
        reds.max, reds.count(_ >= th).toLong))
    }).toSeq.sortBy(_._1)
    assert(got.toSeq === want)
    // The ladder must be non-vacuous: at least one flagged doc at
    // each width, and trigram duplication never exceeds bigram's
    // per source (a longer shingle is strictly harder to repeat).
    Seq(2L, 3L).foreach(w =>
      assert(got.filter(_._1._2 == w).map(_._2._4).sum > 0, s"w=$w vacuous"))
    got.groupBy(_._1._1).foreach { case (src, rows) =>
      val m = rows.map(r => r._1._2 -> r._2._2).toMap
      assert(m(3L) <= m(2L), s"$src: trigram mean above bigram mean")
    }
  }
}
