package graft

import org.apache.spark.sql.functions._

import graft.functions.Lsh

/** The native fused-loop hyperplane code must agree bitwise with the
  * composed aggregate(zip_with) formulation — same sequential product
  * fold per plane — with codegen on and off. */
class LshSpec extends SparkSuite {

  private val planes = Lsh.planes(32, 64)

  test("native hyperplane code == composed HOF code on real embeddings") {
    val e = Tables.embeddings(spark, sfDir)
      .select(Lsh.bucketCode(col("embedding"), planes).as("native"),
        Lsh.bucketCodeBuiltin(col("embedding"), planes).as("composed"))
    assert(e.where(col("native") =!= col("composed")).count() === 0)
    // And non-degenerate: codes spread over many buckets.
    val distinct = e.select(countDistinct(col("native"))).head().getLong(0)
    assert(distinct > 10)
  }

  test("native code identical with codegen off (interpreted path)") {
    val gen = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Lsh.bucketCode(col("embedding"), planes).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val interp = withCodegenOff {
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), Lsh.bucketCode(col("embedding"), planes).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(gen === interp)
  }

  test("md5_sign_bits == hex-char-parity formulation on real tokens") {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokenSet(col("text")))
        .as("t"))
    val cmp = toks.select(
      graft.plans.Md5SignBitsExpr(col("t")).as("native"),
      transform(slice(split(md5(col("t")), ""), 1, 32),
        ch => ascii(ch) % 2 * 2 - 1).as("composed"))
    assert(cmp.where(col("native") =!= col("composed")).count() === 0)
    assert(cmp.count() > 0)
  }

  test("md5_prefix60 == conv(substring(md5)) formulation on real tokens") {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokenSet(col("text")))
        .as("t"))
    val cmp = toks.select(
      graft.functions.MinHash.hash60(col("t")).as("native"),
      graft.functions.MinHash.hash60Builtin(col("t")).as("composed"))
    assert(cmp.where(col("native") =!= col("composed")).count() === 0)
  }

  test("null vector → null code") {
    import spark.implicits._
    val df = Seq(Option.empty[Array[Double]]).toDF("v")
      .select(Lsh.bucketCode(col("v"), Lsh.planes(8, 4)))
    assert(df.head().isNullAt(0))
  }
}
