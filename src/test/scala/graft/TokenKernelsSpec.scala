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

  test("token kernels stay inside whole-stage codegen") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = docs
        .select(TextAnalysis.maxWordFreq(tokens(col("text"))),
          TextAnalysis.rollingFp,
          graft.plans.SpanHashes(col("text"), graft.operators.Dedup.SpanW))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(!p.contains("Found 0 WholeStageCodegen"),
        s"kernels must stay codegen'd:\n$p")
      for (k <- Seq("max_token_freq", "rolling_fp", "span_hashes"))
        assert(p.contains(k), s"$k missing from stages:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
