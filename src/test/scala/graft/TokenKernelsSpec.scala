package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.operators.TextAnalysis

/** Bit-parity of the fused per-token array kernels (max_token_freq,
  * rolling_fp) against their composed-HOF reference forms — the
  * last corpus-wide per-token interpreted folds (under q_repetition
  * and q_fingerprint_rolling). */
class TokenKernelsSpec extends SparkSuite {

  private def docs = Tables.documents(spark, sfDir)

  test("native maxWordFreq == composed sorted-run fold on the real " +
      "corpus, codegen and interpreted") {
    def run() = docs
      .select(col("doc_id"),
        TextAnalysis.maxWordFreq(tokens(col("text"))).as("nat"),
        TextAnalysis.maxWordFreqBuiltin(tokens(col("text"))).as("ref"))
      .collect()
    for (rows <- Seq(run(), withCodegenOff(run()))) {
      assert(rows.nonEmpty)
      for (r <- rows)
        assert(r.getLong(1) == r.getLong(2),
          s"max-freq drift for doc ${r.getLong(0)}: " +
            s"${r.getLong(1)} vs ${r.getLong(2)}")
    }
  }

  test("maxWordFreq edge cases: empty array, single token, all-equal") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("a")),
      (3L, Seq("a", "a", "a")),
      (4L, Seq("b", "a", "b", "c", "b", "a")),
      (5L, Seq("", "", "x"))) // split("") artifacts: empty tokens count
      .toDF("id", "toks")
      .select(col("id"), TextAnalysis.maxWordFreq(col("toks")).as("nat"),
        TextAnalysis.maxWordFreqBuiltin(col("toks")).as("ref"))
      .collect()
    for (r <- rows)
      assert(r.getLong(1) == r.getLong(2), s"drift for id ${r.getLong(0)}")
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 2L))
  }

  test("native rollingFp == composed two-HOF fold on the real corpus, " +
      "codegen and interpreted") {
    def run() = docs
      .select(col("doc_id"), TextAnalysis.rollingFp.as("nat"),
        TextAnalysis.rollingFpBuiltin.as("ref"))
      .collect()
    for (rows <- Seq(run(), withCodegenOff(run()))) {
      assert(rows.nonEmpty)
      for (r <- rows)
        assert(r.getLong(1) == r.getLong(2),
          s"rolling-fp drift for doc ${r.getLong(0)}: " +
            s"${r.getLong(1)} vs ${r.getLong(2)}")
    }
  }

  test("rollingFp is order-sensitive and matches the fold on a " +
      "hand-built permutation pair") {
    import spark.implicits._
    val rows = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.rollingFp.as("nat"),
        TextAnalysis.rollingFpBuiltin.as("ref"))
      .collect()
    for (r <- rows) assert(r.getLong(1) == r.getLong(2))
    assert(rows(0).getLong(1) != rows(1).getLong(1),
      "permuted token order must change the fingerprint")
  }

  private def spanBuiltin(text: org.apache.spark.sql.Column,
      w: Int): org.apache.spark.sql.Column = {
    val toks = graft.functions.TextFunctions.tokens(text)
    val n = size(toks) - (w - 1)
    when(n > 0, transform(sequence(lit(1), n),
      p => graft.functions.MinHash.hash60(
        concat_ws(" ", slice(toks, p, lit(w))))))
      .otherwise(array().cast("array<long>"))
  }

  test("native spanHashes == composed slice+concat spans on the real " +
      "corpus, codegen and interpreted") {
    val W = graft.operators.Dedup.SpanW
    def run() = docs
      .select(col("doc_id"),
        graft.plans.SpanHashes(col("text"), W).as("nat"),
        spanBuiltin(col("text"), W).as("ref"))
      .collect()
    for (rows <- Seq(run(), withCodegenOff(run()))) {
      assert(rows.nonEmpty)
      for (r <- rows)
        assert(r.getSeq[Long](1) === r.getSeq[Long](2),
          s"span-hash drift for doc ${r.getLong(0)}")
    }
  }

  test("spanHashes edge cases: short text, exact width, doubled/" +
      "leading/trailing spaces, unicode") {
    import spark.implicits._
    // The byte-range identity must hold on every split() quirk:
    // doubled spaces make empty tokens, leading/trailing spaces make
    // empty first/last tokens — concat_ws round-trips them all.
    val texts = Seq(
      "", "one", "a b", "a b c", "a b c d",
      "a  b c", "  a b", "a b  ", " ",
      "café über naïve résumé ωmega",
      ("x " * 10).trim)
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (w <- Seq(1, 2, 3, 4)) {
      val got = rows.select(col("doc_id"),
        graft.plans.SpanHashes(col("text"), w).as("nat"),
        spanBuiltin(col("text"), w).as("ref")).collect()
      for (r <- got)
        assert(r.getSeq[Long](1) === r.getSeq[Long](2),
          s"drift for text '${texts(r.getLong(0).toInt)}' at w=$w")
    }
  }

  test("native sortedPairCount == map-lookup fold on the real corpus " +
      "shingle pairs, codegen and interpreted") {
    import graft.functions.TextFunctions.wordShingles
    // Doc side: sorted xxhash64 shingles (dups kept). Test side: the
    // map the r8 fold used, PLUS the kernel's sorted keys + counts —
    // both derived from the same shingle stream.
    val sh = docs.limit(40)
      .select(col("doc_id"),
        explode(wordShingles(col("text"), 3)).as("sng"))
      .groupBy(col("doc_id"), xxhash64(col("sng")).as("h"))
      .agg(count(lit(1)).as("c"))
    val tests = sh.where(col("doc_id") < 5)
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("h"), col("c"))))
        .as("m"),
        sort_array(collect_list(struct(col("h"), col("c")))).as("e"))
      .select(col("doc_id").as("test_id"), col("m"),
        col("e.h").as("keys"), col("e.c").as("cnts"))
    def run() = docs.limit(40).where(col("doc_id") >= 5)
      .select(col("doc_id"),
        sort_array(transform(wordShingles(col("text"), 3),
          g => xxhash64(g))).as("sngs"))
      .crossJoin(broadcast(tests))
      .select(col("doc_id"), col("test_id"),
        graft.plans.SortedPairCount(col("sngs"), col("keys"),
          col("cnts")).as("nat"),
        expr("""aggregate(sngs, CAST(0 AS BIGINT),
              (acc, g) -> acc + coalesce(element_at(m, g),
                                         CAST(0 AS BIGINT)))""")
          .as("ref"))
      .collect()
    for (rows <- Seq(run(), withCodegenOff(run()))) {
      assert(rows.nonEmpty)
      assert(rows.exists(_.getLong(2) > 0L),
        "fixture must exercise at least one non-empty intersection")
      for (r <- rows)
        assert(r.getLong(2) == r.getLong(3),
          s"pair-count drift for (${r.getLong(0)}, ${r.getLong(1)}): " +
            s"${r.getLong(2)} vs ${r.getLong(3)}")
    }
  }

  test("sortedPairCount edge cases: empty sides, dup doc hashes, " +
      "disjoint and superset keys") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq.empty[Long], Seq(1L, 5L), Seq(2L, 3L), 0L),
      (2L, Seq(1L, 1L, 5L), Seq.empty[Long], Seq.empty[Long], 0L),
      (3L, Seq(1L, 1L, 5L), Seq(1L, 5L), Seq(2L, 3L), 7L),
      (4L, Seq(2L, 3L, 4L), Seq(1L, 5L), Seq(2L, 3L), 0L),
      (5L, Seq(3L), Seq(1L, 2L, 3L, 4L), Seq(1L, 1L, 9L, 1L), 9L),
      (6L, Seq(-5L, -5L, 0L, 2L), Seq(-5L, 2L), Seq(4L, 1L), 9L))
      .toDF("id", "doc", "keys", "cnts", "want")
      .select(col("id"), col("want"),
        graft.plans.SortedPairCount(col("doc"), col("keys"),
          col("cnts")).as("got"))
      .collect()
    for (r <- rows)
      assert(r.getLong(2) == r.getLong(1),
        s"case ${r.getLong(0)}: got ${r.getLong(2)} want ${r.getLong(1)}")
  }

  /** The composed form [[graft.plans.TermFreqs]] replaced (r9 verdict
    * item: O(len × distinct) per doc — the q_stream_index quadratic). */
  private def termFreqsBuiltin(
      toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(array_distinct(toks), t =>
      struct(t.as("term"),
        size(filter(toks, x => x === t)).cast("long").as("tf")))

  test("native termFreqs == composed distinct+filter-count postings on " +
      "the real corpus, codegen and interpreted") {
    def run() = docs
      .select(col("doc_id"),
        graft.plans.TermFreqs(tokens(col("text"))).as("nat"),
        termFreqsBuiltin(tokens(col("text"))).as("ref"))
      .collect()
    for (rows <- Seq(run(), withCodegenOff(run()))) {
      assert(rows.nonEmpty)
      for (r <- rows) {
        val nat = r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => (p.getString(0), p.getLong(1)))
        val ref = r.getSeq[org.apache.spark.sql.Row](2)
          .map(p => (p.getString(0), p.getLong(1)))
        assert(nat === ref,
          s"term-freq drift for doc ${r.getLong(0)}")
      }
    }
  }

  test("termFreqs edge cases: empty, dups, null token, first-occurrence " +
      "order") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("b", "a", "b", "c", "b", "a")),
      (3L, Seq("x", null, "x", null)),
      (4L, Seq("", "", "x")))
      .toDF("id", "toks")
      .select(col("id"),
        graft.plans.TermFreqs(col("toks")).as("nat"),
        termFreqsBuiltin(col("toks")).as("ref"))
      .collect()
    for (r <- rows) {
      val nat = r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (Option(p.getString(0)), p.getLong(1)))
      val ref = r.getSeq[org.apache.spark.sql.Row](2)
        .map(p => (Option(p.getString(0)), p.getLong(1)))
      assert(nat === ref, s"drift for id ${r.getLong(0)}")
    }
    // First-occurrence order and the (null, 0) posting, pinned
    // explicitly (the composed form's null === x is never true).
    val byId = rows.map(r => r.getLong(0) ->
      r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (Option(p.getString(0)), p.getLong(1)))).toMap
    assert(byId(2L) === Seq((Some("b"), 3L), (Some("a"), 2L),
      (Some("c"), 1L)))
    assert(byId(3L) === Seq((Some("x"), 2L), (None, 0L)))
    assert(byId(4L) === Seq((Some(""), 2L), (Some("x"), 1L)))
  }

  test("long-doc smoke: 50k-token docs through the tf/span/max-freq " +
      "kernels stay per-doc-linearithmic") {
    import spark.implicits._
    // Row-LENGTH scaling (the r9 q_stream_index lesson: row-COUNT
    // smokes never see a per-doc quadratic). 16 docs × 50k tokens,
    // vocab 25k (every term appears exactly twice): the replaced
    // composed posting form costs len × distinct = 1.25e9 interpreted
    // compares PER DOC here (minutes for the batch); the one-pass
    // kernels finish the whole batch well inside the bound.
    val vocab = 25000
    val toks = 50000
    val docs = (0L until 16L).map { d =>
      (d, (0 until toks).map(i => s"w${(i * 7 + d) % vocab}")
        .mkString(" "))
    }.toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val got = docs.select(col("doc_id"),
        size(graft.plans.TermFreqs(tokens(col("text")))).as("n_terms"),
        aggregate(graft.plans.TermFreqs(tokens(col("text"))),
          lit(0L), (acc, p) => acc + p.getField("tf")).as("tf_sum"),
        TextAnalysis.maxWordFreq(tokens(col("text"))).as("mx"),
        size(graft.plans.SpanHashes(col("text"),
          graft.operators.Dedup.SpanW)).as("n_spans"),
        size(graft.functions.TextFunctions.wordShingles(col("text"), 3))
          .as("n_shingles"))
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    for (r <- got) {
      assert(r.getAs[Int]("n_terms") === vocab)
      assert(r.getAs[Long]("tf_sum") === toks.toLong)
      assert(r.getAs[Long]("mx") === 2L)
      assert(r.getAs[Int]("n_spans") ===
        toks - graft.operators.Dedup.SpanW + 1)
      // wordShingles is a distinct SET; token i = w[(7i+d) % vocab]
      // makes the triple at i a pure function of i % vocab, so the
      // 49998 positions collapse to exactly `vocab` distinct
      // shingles.
      assert(r.getAs[Int]("n_shingles") === vocab)
    }
    info(f"16 × 50k-token docs through 5 kernels in $secs%.2f s")
    assert(secs < 60.0,
      f"long-doc kernel pass took $secs%.1f s — a per-doc quadratic " +
        "regression (the bound separates: the composed posting form " +
        "alone needs minutes here)")
  }

  test("token kernels stay inside whole-stage codegen") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = docs
        .select(TextAnalysis.maxWordFreq(tokens(col("text"))),
          TextAnalysis.rollingFp,
          graft.plans.SpanHashes(col("text"), graft.operators.Dedup.SpanW),
          graft.plans.TermFreqs(tokens(col("text"))))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(!p.contains("Found 0 WholeStageCodegen"),
        s"kernels must stay codegen'd:\n$p")
      for (k <- Seq("max_token_freq", "rolling_fp", "span_hashes",
          "term_freqs"))
        assert(p.contains(k), s"$k missing from stages:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
