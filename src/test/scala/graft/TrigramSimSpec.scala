package graft

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** The native TrigramSim expression must agree BITWISE with the
  * composed HOF form it replaces, in both codegen and interpreted
  * modes, over real corpus names and adversarial edge strings.
  */
class TrigramSimSpec extends SparkSuite {
  import spark.implicits._

  private val edge = Seq(
    "", "a", "ab", "abc", "AbAbab", "aaaa", "   ", "a b c d",
    "hello", "HELLO", "lightning bolt", "lightning balt",
    "key agg row scna slow fa", "xyzxyzxyz", "zzz zzz zzz",
    // non-BMP: supplementary chars must count as ONE code point
    "a😀b😀c", "𝄞𝄞abc",
    "café cafés", "ßßss")

  test("native trigramSim == composed form on edge strings (both orders)") {
    val pairs = for (a <- edge; b <- edge) yield (a, b)
    val df = pairs.toDF("a", "b")
      .select(trigramSim($"a", $"b").as("nat"),
        trigramSimBuiltin($"a", $"b").as("ref"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native=${r.getDouble(0)} composed=${r.getDouble(1)}")
    }
  }

  test("native trigramSim == composed form over corpus names") {
    val names = Tables.documents(spark, sfDir)
      .select(docName(col("text")).as("name"))
    val q = "key agg row scna slow fa"
    val df = names.select(trigramSim(col("name"), lit(q)).as("nat"),
      trigramSimBuiltin(col("name"), lit(q)).as("ref"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("interpreted eval matches codegen") {
    val pairs = edge.map(a => (a, "lightning bolt"))
    val on = pairs.toDF("a", "b")
      .select(trigramSim($"a", $"b")).collect().map(_.getDouble(0))
    val off = withCodegenOff {
      pairs.toDF("a", "b")
        .select(trigramSim($"a", $"b")).collect().map(_.getDouble(0))
    }
    assert(on.toSeq === off.toSeq)
  }

  test("foldable-side caching is bitwise-transparent (both sides)") {
    // The literal side's trigram set is precomputed once (reference
    // object in codegen, lazy val interpreted) — results must stay
    // bitwise identical to the uncached two-column path.
    val q = "lightning bolt"
    val twoCol = edge.map(a => (a, q)).toDF("a", "b")
      .select(trigramSim($"a", $"b")).collect().map(_.getDouble(0)).toSeq
    def litRight() = edge.toDF("a")
      .select(trigramSim($"a", lit(q))).collect().map(_.getDouble(0)).toSeq
    def litLeft() = edge.toDF("a")
      .select(trigramSim(lit(q), $"a")).collect().map(_.getDouble(0)).toSeq
    def bits(xs: Seq[Double]) = xs.map(java.lang.Double.doubleToLongBits)
    assert(bits(litRight()) === bits(twoCol))
    assert(bits(litLeft()) === bits(twoCol)) // jaccard is symmetric
    assert(bits(withCodegenOff(litRight())) === bits(twoCol))
    assert(bits(withCodegenOff(litLeft())) === bits(twoCol))
  }

  test("null literal side stays null-safe") {
    val df = edge.toDF("a")
      .select(trigramSim($"a", lit(null).cast("string")))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("null propagates") {
    val df = Seq((Option("abc"), Option.empty[String]))
      .toDF("a", "b").select(trigramSim($"a", $"b"))
    assert(df.head().isNullAt(0))
  }
}
