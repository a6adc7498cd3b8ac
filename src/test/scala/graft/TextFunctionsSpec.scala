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
}
