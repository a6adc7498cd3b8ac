package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.plans.NearestCell

/** The native NearestCell argmin must agree with the composed
  * crossJoin + min(struct(dist2, cid)) formulation it replaced (the
  * formulation the DuckDB oracle still runs), in both codegen and
  * interpreted modes, including the cid tie-break.
  */
class NearestCellSpec extends SparkSuite {
  import spark.implicits._

  private def centsDf(cs: Seq[(Long, Seq[Double])]) =
    cs.toDF("cid", "cvec")
      .agg(sort_array(collect_list(struct($"cid", $"cvec"))).as("cents"))

  test("native argmin == composed min(struct(dist2,cid)) on real vectors") {
    val e = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val seeds = e
      .orderBy(md5($"vec_id".cast("string")).asc, $"vec_id".asc).limit(16)
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))

    val native = e.crossJoin(broadcast(
        seeds.agg(sort_array(collect_list(struct($"cid", $"cvec")))
          .as("cents"))))
      .select($"vec_id", NearestCell($"embedding", $"cents").as("cid"))

    val composed = e.crossJoin(broadcast(seeds))
      .select($"vec_id",
        struct(dist2Builtin($"embedding", $"cvec").as("d"), $"cid").as("dc"))
      .groupBy($"vec_id").agg(min($"dc").as("dc"))
      .select($"vec_id", $"dc.cid".as("cid"))

    val mismatches = native.alias("n")
      .join(composed.alias("c"), Seq("vec_id"))
      .where(col("n.cid") =!= col("c.cid"))
      .count()
    assert(mismatches === 0L)
  }

  test("equidistant centroids tie-break to the smaller cid") {
    val cents = centsDf(Seq(
      (7L, Seq(1.0, 0.0)), (3L, Seq(-1.0, 0.0)), (9L, Seq(1.0, 0.0))))
    val r = Seq(Seq(0.0, 5.0)).toDF("v").crossJoin(cents)
      .select(NearestCell($"v", $"cents")).head()
    assert(r.getLong(0) === 3L) // dist ties across all three; min cid wins
  }

  test("interpreted eval matches codegen") {
    val vs = Seq(Seq(0.1, 0.2), Seq(-0.5, 0.25), Seq(0.0, 0.0))
    val cents = centsDf(Seq((1L, Seq(0.0, 0.25)), (2L, Seq(0.1, 0.19))))
    def run() = vs.toDF("v").crossJoin(cents)
      .select(NearestCell($"v", $"cents")).collect().map(_.getLong(0)).toSeq
    val on = run()
    val off = withCodegenOff(run())
    assert(on === off)
  }

  test("empty centroid array yields null") {
    val cents = Seq.empty[(Long, Seq[Double])]
      .toDF("cid", "cvec")
      .agg(collect_list(struct($"cid", $"cvec")).as("cents"))
    val r = Seq(Seq(1.0)).toDF("v").crossJoin(cents)
      .select(NearestCell($"v", $"cents")).head()
    assert(r.isNullAt(0))
  }

  test("null centroid elements and null struct fields are skipped") {
    // collect_list arrays carry containsNull metadata; build the
    // malformed shape directly with SQL literals.
    def run() = spark.sql(
      """SELECT nearest_cell(array(0.0d, 0.0d), array(
        |  CAST(NULL AS STRUCT<cid: BIGINT, cvec: ARRAY<DOUBLE>>),
        |  named_struct('cid', CAST(NULL AS BIGINT), 'cvec', array(9.0d, 9.0d)),
        |  named_struct('cid', 5L, 'cvec', CAST(NULL AS ARRAY<DOUBLE>)),
        |  named_struct('cid', 2L, 'cvec', array(1.0d, 1.0d)),
        |  named_struct('cid', 1L, 'cvec', array(3.0d, 3.0d))))""".stripMargin)
      .head()
    assert(run().getLong(0) === 2L) // only valid centroids compete
    assert(withCodegenOff(run()).getLong(0) === 2L)
  }

  test("all-null / all-invalid centroid arrays yield null, not a crash") {
    def run() = spark.sql(
      """SELECT nearest_cell(array(0.0d), array(
        |  CAST(NULL AS STRUCT<cid: BIGINT, cvec: ARRAY<DOUBLE>>),
        |  named_struct('cid', 4L, 'cvec', CAST(NULL AS ARRAY<DOUBLE>))))"""
        .stripMargin).head()
    assert(run().isNullAt(0))
    assert(withCodegenOff(run()).isNullAt(0))
  }

  test("centroid vectors shorter than the query use the shared prefix") {
    // query (0,0,10): cid 1's 2-dim centroid (0,0) compares on the
    // first two dims only (dist 0) and must win over cid 2's exact
    // 3-dim (1,1,10) at dist 2 — bounded loop, no AIOOBE.
    def run() = spark.sql(
      """SELECT nearest_cell(array(0.0d, 0.0d, 10.0d), array(
        |  named_struct('cid', 1L, 'cvec', array(0.0d, 0.0d)),
        |  named_struct('cid', 2L, 'cvec', array(1.0d, 1.0d, 10.0d))))"""
        .stripMargin).head()
    assert(run().getLong(0) === 1L)
    assert(withCodegenOff(run()).getLong(0) === 1L)
  }

  test("wrong input types fail at analysis time") {
    val df = Seq((Seq(1, 2), Seq(1.0))).toDF("ints", "doubles")
    val ex = intercept[AnalysisException] {
      df.select(NearestCell($"ints", $"doubles")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("nearest_cell"))
  }

  test("Top2Cells: c1 == nearest_cell and (c2, d2) == the composed " +
      "rank-2 formulation on real vectors") {
    import graft.plans.Top2Cells
    val e = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val seeds = e
      .orderBy(md5($"vec_id".cast("string")).asc, $"vec_id".asc).limit(16)
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    val centArr = broadcast(seeds
      .agg(sort_array(collect_list(struct($"cid", $"cvec"))).as("cents")))

    val native = e.crossJoin(centArr)
      .select($"vec_id",
        NearestCell($"embedding", $"cents").as("nc"),
        Top2Cells($"embedding", $"cents").as("t"))
      .select($"vec_id", $"nc", $"t.c1", $"t.d1", $"t.c2", $"t.d2")
    // c1 is exactly the NearestCell assignment.
    assert(native.where($"nc" =!= $"c1").count() === 0L)
    assert(native.where($"d2" < $"d1").count() === 0L)

    // (c2, d2) matches ranking all centroids by (d asc, cid asc) and
    // taking row 2 — the oracle's row_number() formulation.
    val composed = e.crossJoin(broadcast(seeds))
      .select($"vec_id",
        struct(dist2Builtin($"embedding", $"cvec").as("d"), $"cid").as("dc"))
      .groupBy($"vec_id")
      .agg(sort_array(collect_list($"dc")).as("ranked"))
      .select($"vec_id",
        $"ranked"(1)("cid").as("c2x"), $"ranked"(1)("d").as("d2x"))
    val bad = native.join(composed, Seq("vec_id"))
      .where($"c2" =!= $"c2x" || $"d2" =!= $"d2x").count()
    assert(bad === 0L)
  }

  test("Top2Cells: tie-break, interpreted parity, <2 usable centroids") {
    import graft.plans.Top2Cells
    // Three centroids, all equidistant: ranks are cid-ascending.
    val cents = centsDf(Seq(
      (7L, Seq(1.0, 0.0)), (3L, Seq(-1.0, 0.0)), (9L, Seq(1.0, 0.0))))
    def run() = Seq(Seq(0.0, 5.0)).toDF("v").crossJoin(cents)
      .select(Top2Cells($"v", $"cents").as("t"))
      .select($"t.c1", $"t.c2").head()
    val r = run()
    assert((r.getLong(0), r.getLong(1)) === ((3L, 7L)))
    val ri = withCodegenOff(run())
    assert((ri.getLong(0), ri.getLong(1)) === ((3L, 7L)))
    // One usable centroid: no rank-2 exists — whole struct is null.
    val one = centsDf(Seq((1L, Seq(0.0, 0.0))))
    def run1() = Seq(Seq(0.0, 1.0)).toDF("v").crossJoin(one)
      .select(Top2Cells($"v", $"cents").as("t")).head()
    assert(run1().isNullAt(0))
    assert(withCodegenOff(run1()).isNullAt(0))
  }
}
