package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("trigrams: len<3 → empty; distinct; lowercased") {
    val rows = Seq("ab", "", "AbAbab", "hello").toDF("s")
      .select(trigrams($"s")).collect().map(_.getSeq[String](0))
    assert(rows(0).isEmpty && rows(1).isEmpty)
    assert(rows(2).toSet === Set("aba", "bab")) // distinct, lowercased
    assert(rows(3) === Seq("hel", "ell", "llo"))
  }

  test("jaccard: empty sets → 0.0; disjoint → 0.0; identical → 1.0") {
    val df = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a"), Seq("b")),
      (Seq("a", "b"), Seq("b", "a")),
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
    ).toDF("a", "b").select(jaccard($"a", $"b"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(0.0, 0.0, 1.0, 0.5))
  }

  test("wordShingles: fewer tokens than n → empty; bigrams in order") {
    val rows = Seq("one", "one two three").toDF("s")
      .select(wordShingles($"s", 2)).collect().map(_.getSeq[String](0))
    assert(rows(0).isEmpty)
    assert(rows(1) === Seq("one two", "two three"))
  }

  test("trigramSim symmetric and bounded") {
    val df = Seq(("lightning bolt", "lightning balt")).toDF("a", "b")
      .select(trigramSim($"a", $"b").as("ab"), trigramSim($"b", $"a").as("ba"))
    val r = df.head()
    assert(r.getDouble(0) === r.getDouble(1))
    assert(r.getDouble(0) > 0.0 && r.getDouble(0) < 1.0)
  }

  test("native trigrams == composed HOF form, codegen and interpreted") {
    // Content AND order must match: the stored trigram index and the
    // prefilter derive bucket hashes from these exact strings.
    val cases = Seq("", "ab", "abc", "ABCd", "aaaa", "key agg row scna",
      "a b c", "  x  ", "mixed CASE here", "don't-stop.now", "abécd")
    for (s <- cases) {
      def run() = spark.range(1)
        .select(trigrams(lit(s)).as("nat"), trigramsBuiltin(lit(s)).as("ref"))
        .head()
      val r = run()
      assert(r.getSeq[String](0) === r.getSeq[String](1),
        s"native/HOF trigram drift for '$s' (codegen)")
      val ri = withCodegenOff(run())
      assert(ri.getSeq[String](0) === ri.getSeq[String](1),
        s"native/HOF trigram drift for '$s' (interpreted)")
    }
  }

  test("native wordShingles == composed HOF form, codegen and interpreted") {
    // The shingle kernel under minhash dedup / contamination: the
    // fused expression must reproduce the HOF tree's exact output
    // (order included) — adversarial inputs hit multi-space (empty
    // tokens), repeats (distinct), and short strings (< n tokens).
    val cases = Seq("", " ", "  ", "a", "a b", "a b c d", "x x x x x",
      "a  b   c", "one two three two one", "trailing space ",
      " leading", "a b c a b c a b")
    for (n <- Seq(2, 3); s <- cases) {
      def run() = spark.range(1)
        .select(wordShingles(lit(s), n).as("nat"),
          wordShinglesBuiltin(lit(s), n).as("ref"))
        .head()
      val r = run()
      assert(r.getSeq[String](0) === r.getSeq[String](1),
        s"native/HOF drift for '$s' n=$n (codegen)")
      val ri = withCodegenOff(run())
      assert(ri.getSeq[String](0) === ri.getSeq[String](1),
        s"native/HOF drift for '$s' n=$n (interpreted)")
    }
  }

  test("driver-side twins match their Column kernels (index-probe safety)") {
    // trigramsOf and hash60Local feed the stored-index probes'
    // plan-time bucket pruning: if either drifts from its Column
    // twin, probes prune the WRONG buckets and silently miss rows.
    // Pin them over adversarial strings (repeats, spaces, case,
    // len<3, empty, digits, punctuation).
    val rng = new scala.util.Random(7)
    val cases = Seq("", "a", "ab", "abc", "aaaa", "key agg row scna",
      "AbC dEf", "  x  ", "zz zz zz", "a1b2c3", "don't-stop.now") ++
      (0 until 30).map(_ => (0 until rng.nextInt(12))
        .map(_ => "abAB z12.'"(rng.nextInt(10))).mkString)
    for (s <- cases) {
      val fromCol = spark.range(1)
        .select(trigrams(lit(s)).as("t"), graft.functions.MinHash
          .hash60(lit(s)).as("h"))
        .head()
      assert(fromCol.getSeq[String](0).toSet === trigramsOf(s).toSet,
        s"trigramsOf drift for '$s'")
      assert(fromCol.getLong(1) === graft.functions.MinHash.hash60Local(s),
        s"hash60Local drift for '$s'")
    }
  }
}
