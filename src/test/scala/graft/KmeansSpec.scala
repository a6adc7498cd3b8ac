package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Exact driver-side recomputation of the converged Lloyd clustering
  * — same seeding, same sequential double distance fold, same
  * fixed-point centroid means, same stop rule — so q_kmeans' whole
  * iteration (not just its final stats) is pinned in-repo at a
  * second scale factor beside the DuckDB unrolled-oracle gate. */
class KmeansSpec extends SparkSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def micro(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  test("q_kmeans matches an exact driver-side Lloyd recomputation " +
      "(assignments, checksum, conv_iter)") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toSeq.sortBy(_._1)
    val byId = vecs.toMap

    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    def nearest(v: Array[Double],
        cents: Seq[(Long, Array[Double])]): Long = {
      var bestId = Long.MaxValue; var bestD = Double.PositiveInfinity
      cents.sortBy(_._1).foreach { case (cid, cv) =>
        val d = dist2(v, cv)
        if (d < bestD || (d == bestD && cid < bestId)) {
          bestD = d; bestId = cid
        }
      }
      bestId
    }
    def centroids(assign: Map[Long, Long]): Seq[(Long, Array[Double])] =
      assign.groupBy(_._2).toSeq.map { case (cid, members) =>
        val vs = members.keys.toSeq.map(byId)
        val dim = vs.head.length
        val cv = Array.tabulate(dim) { i =>
          val ms = vs.map(v => micro(v(i) * 1e6)).sum
          ms.toDouble / vs.size / 1e6
        }
        cid -> cv
      }

    val seeds = vecs.map(_._1)
      .sortBy(id => (md5hex(id.toString), id)).take(Ann.KmK)
      .map(id => id -> byId(id))
    var assign: Map[Long, Long] =
      vecs.map { case (id, v) => id -> nearest(v, seeds) }.toMap
    var t = 0
    var conv = -1
    while (conv < 0 && t < Ann.KmMaxIters) {
      t += 1
      val next = {
        val cs = centroids(assign)
        vecs.map { case (id, v) => id -> nearest(v, cs) }.toMap
      }
      if (next == assign) conv = t else assign = next
    }
    assert(conv > 0, "driver recomputation must converge under the cap")

    val want = assign.groupBy(_._2).toSeq.map { case (cid, members) =>
      val ids = members.keys.toSeq
      val sm = ids.map(id => byId(id).map(x => micro(x * 1e6)).sum).sum
      (cid, ids.size.toLong, sm, conv.toLong)
    }.sortBy(_._1)

    val got = Ann.kmeansConverged(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("KmeansKernel.step ≡ the pure-DataFrame step formulation " +
      "(partials, counts, moved)") {
    import graft.functions.VectorFunctions.microInts
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val seeds = e
      .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
      .limit(Ann.KmK)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    // A second, intentionally different centroid set (the first KmK
    // ids) so moved > 0 exercises the prev-comparison arm.
    val alt = e.orderBy(col("vec_id").asc).limit(Ann.KmK)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)

    val corpus = graft.plans.KmeansKernel.cacheCorpus(
      e.select(col("vec_id"), col("embedding"),
        microInts(col("embedding")).as("mi")))
    try {
      val step = graft.plans.KmeansKernel.step(spark, corpus, seeds,
        Some(alt))

      def centsDf(cs: Array[(Long, Array[Double])]) = {
        import spark.implicits._
        spark.createDataFrame(cs.toSeq.map { case (cid, cv) =>
          (cid, cv.toSeq) }).toDF("cid", "cvec")
          .agg(sort_array(collect_list(struct(col("cid"), col("cvec"))))
            .as("arr"))
      }
      val df = e.crossJoin(broadcast(centsDf(seeds)))
        .crossJoin(broadcast(centsDf(alt).withColumnRenamed("arr", "arr2")))
        .select(
          graft.plans.NearestCell(col("embedding"), col("arr")).as("cid"),
          (graft.plans.NearestCell(col("embedding"), col("arr")) =!=
            graft.plans.NearestCell(col("embedding"), col("arr2")))
            .cast("long").as("moved"),
          microInts(col("embedding")).as("mi"))
        .groupBy(col("cid"))
        .agg(graft.plans.ElementwiseSum(col("mi"), Ann.Dim).as("ms"),
          count(lit(1)).as("n"), sum(col("moved")).as("mv"))
        .collect()
      val wantCells = df.map(r => (r.getAs[Long]("cid"),
          r.getAs[Long]("n"), r.getSeq[Long](r.fieldIndex("ms")).toSeq))
        .sortBy(_._1).toSeq
      val wantMoved = df.map(_.getAs[Long]("mv")).sum
      val gotCells = step.cells
        .map(c => (c.cid, c.n, c.ms.toSeq)).sortBy(_._1).toSeq
      assert(gotCells === wantCells)
      assert(step.moved === wantMoved)
      assert(step.moved > 0L,
        "alt centroids must actually move some assignments")
    } finally corpus.unpersist(blocking = false)
  }

  test("KmeansKernel iteration is partitioning-invariant: 1, 3 and " +
      "default corpus partitions produce identical cells and conv_iter") {
    // The GraphSpec/BspKernel lesson generalized (the r9 message-loss
    // bug was invisible whenever state sized to ONE partition): every
    // RDD kernel must pin that its result does not depend on how its
    // data is sharded. Here the per-partition partials are int64
    // sums + counts (commutative), so any divergence is a real
    // merge/assignment bug.
    val e = Tables.embeddings(spark, sfDir)
    def run(in: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long,
        Long)] =
      Ann.kmeansConvergedOver(in).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
    val base = run(e)
    assert(base.nonEmpty)
    for (p <- Seq(1, 3))
      assert(run(e.repartition(p)) === base,
        s"diverged at $p corpus partitions")
  }
}
