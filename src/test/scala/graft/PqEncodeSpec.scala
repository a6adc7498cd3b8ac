package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Bit-parity of the fused native PQ encoder against the composed
  * slice+zip_with+aggregate+array_min formulation — the kernel under
  * q_ann_pq and the stored codes index (the corpus-wide encode pass
  * is the PQ tier's hot path at 100 TB). */
class PqEncodeSpec extends SparkSuite {

  private def parity(e: org.apache.spark.sql.DataFrame): Unit = {
    val cb = Ann.pqCodebookFor(
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")))
    def run() = e.crossJoin(cb)
      .select(col("vec_id"), Ann.pqCodes.as("nat"),
        Ann.pqCodesBuiltin.as("ref"))
      .collect()
    for (rows <- Seq(run(), withCodegenOff(run()))) {
      assert(rows.nonEmpty)
      for (r <- rows)
        assert(r.getSeq[Int](1) === r.getSeq[Int](2),
          s"native/HOF code drift for vec ${r.getLong(0)}")
    }
  }

  test("native pqCodes == composed HOF form on the real corpus, " +
      "codegen and interpreted") {
    parity(Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")))
  }

  test("native pqCodes == composed HOF form on adversarial vectors " +
      "(NaN subspace, negatives, zeros, extremes)") {
    // NaN: Double.compare(NaN, x) > 0 and NaN == NaN — the composed
    // array_min(struct(d, j)) ordering; an all-NaN subspace must
    // yield j = 0 on both paths.
    val dim = 64
    def vec(f: Int => Double) = (0 until dim).map(f).toArray
    val rows = Seq(
      1000L -> vec(i => if (i < 8) Double.NaN else i * 0.1),
      1001L -> vec(_ => Double.NaN),
      1002L -> vec(i => -1e300 * (i % 3)),
      1003L -> vec(_ => 0.0),
      1004L -> vec(i => if (i % 2 == 0) Double.MinPositiveValue else 1e18))
    import spark.implicits._
    parity(rows.toDF("vec_id", "embedding"))
  }

  test("pqCodes stays inside whole-stage codegen") {
    // AQE defers codegen until execution — disable it so the codegen
    // explain shows the compiled stages (same guard as PlanSpec's
    // cosine test).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      val p = e.crossJoin(Ann.pqCodebookFor(e))
        .select(Ann.pqCodes.as("codes"))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(!p.contains("Found 0 WholeStageCodegen"),
        s"encode must stay codegen'd:\n$p")
      assert(p.contains("pq_encode"), s"kernel missing from stages:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
