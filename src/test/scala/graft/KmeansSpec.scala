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
}
