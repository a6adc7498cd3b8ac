package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** The native codegen'd [[graft.plans.CosineSimilarity]] must agree
  * BITWISE with the built-in `aggregate(zip_with(...))` composition
  * (both are strict left-to-right double folds), with codegen on and
  * off, and must honor the documented null/zero/length semantics. */
class CosineSimilaritySpec extends SparkSuite {
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((Array.fill(dim)(rnd.nextGaussian()),
      Array.fill(dim)(rnd.nextGaussian())))
  }

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  test("native == builtin bitwise, codegen on") {
    val df = randVecs(200, 64, seed = 1).toDF("a", "b")
      .select(cosineSim($"a", $"b").as("n"), cosineBuiltin($"a", $"b").as("r"))
    df.collect().foreach { row =>
      assert(bits(row.getDouble(0)) === bits(row.getDouble(1)))
    }
  }

  test("native == builtin bitwise, codegen off (interpreted path)") {
    withCodegenOff {
      val df = randVecs(200, 64, seed = 2).toDF("a", "b")
        .select(cosineSim($"a", $"b").as("n"), cosineBuiltin($"a", $"b").as("r"))
      df.collect().foreach { row =>
        assert(bits(row.getDouble(0)) === bits(row.getDouble(1)))
      }
    }
  }

  test("interpreted == codegen bitwise on the same rows") {
    val data = randVecs(100, 33, seed = 3).toDF("a", "b")
    val gen = data.select(cosineSim($"a", $"b")).collect().map(_.getDouble(0))
    val interp = withCodegenOff {
      data.select(cosineSim($"a", $"b")).collect().map(_.getDouble(0))
    }
    gen.zip(interp).foreach { case (g, i) => assert(bits(g) === bits(i)) }
  }

  test("null inputs → null") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), None: Option[Array[Double]]),
      (None: Option[Array[Double]], Some(Array(1.0, 2.0))),
      (None: Option[Array[Double]], None: Option[Array[Double]]),
    ).toDF("a", "b").select(cosineSim($"a", $"b"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("zero vector → 0.0; length mismatch → 0.0") {
    val df = Seq(
      (Array(0.0, 0.0), Array(1.0, 2.0)),
      (Array(1.0, 2.0), Array(0.0, 0.0)),
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0)),
    ).toDF("a", "b").select(cosineSim($"a", $"b"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(0.0, 0.0, 0.0))
  }

  test("identical vectors → 1.0 (within one ulp)") {
    val v = Array.tabulate(64)(i => 0.1 * (i + 1))
    val sim = Seq((v, v)).toDF("a", "b")
      .select(cosineSim($"a", $"b")).head().getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-15)
  }
}
