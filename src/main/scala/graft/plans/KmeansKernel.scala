package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.storage.StorageLevel

/** The Lloyd-step executor behind q_kmeans — the MLlib KMeans shape
  * (broadcast centroids down, per-partition partials up), executed
  * below the DataFrame API because a data-dependent iterative loop
  * cannot reuse one compiled plan: every fresh per-step plan pays
  * 0.17-0.25 s of Catalyst analysis/optimization/codegen at local[32]
  * against ~25 ms of actual work (measured at sf0.1; see
  * [[graft.operators.Ann.kmeansConvergedOver]]).
  *
  * Numerics are NOT re-implemented here: the per-row argmin is the
  * very [[NearestCellUtil.nearest]] the SQL expression evals, applied
  * to the same catalyst representation (`queryExecution.toRdd` rows,
  * centroids rebuilt as an `array<struct<cid, cvec>>` [[ArrayData]]
  * per task), and the fixed-point micro encoding arrives PRE-COMPUTED
  * by the `microInts` column inside the cached projection — the
  * kernel only sums ints. KmeansSpec asserts one kernel step ≡ the
  * pure-DataFrame step formulation, and pins the full converged
  * iteration against an independent driver-side recomputation.
  */
object KmeansKernel {

  /** Per-cell step partials: member count and the [[ArrayData]]
    * micro-int elementwise sums (the ElementwiseSum state). */
  final case class Cell(cid: Long, n: Long, ms: Array[Long])

  /** One Lloyd step's result: cells keyed by the CURRENT assignment
    * plus the count of rows whose current assignment differs from
    * their previous one (0 when `prev` is None). */
  final case class StepResult(cells: Array[Cell], moved: Long)

  /** Cache the corpus as catalyst rows. `prepared` must project
    * (vec_id, embedding: array<double>, mi: array<int>) — column
    * POSITIONS are the contract. UnsafeRows are buffer-backed, so
    * each is copied once into the cache. */
  def cacheCorpus(prepared: DataFrame): RDD[InternalRow] = {
    val rdd = prepared.queryExecution.toRdd.map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count()
    rdd
  }

  private def toArrayData(cents: Array[(Long, Array[Double])]): ArrayData =
    new GenericArrayData(cents.map { case (cid, cv) =>
      new GenericInternalRow(Array[Any](cid,
        UnsafeArrayData.fromPrimitiveArray(cv)))
    }.toArray[Any])

  /** One Lloyd step: assign every row to its nearest `cur` centroid
    * ([[NearestCellUtil.nearest]] — the SQL expression's own argmin),
    * sum the row's precomputed micro-ints into its cell, and count
    * rows whose nearest `prev` centroid differs. One job; partials
    * are O(partitions × k × dim). */
  def step(sp: SparkSession, corpus: RDD[InternalRow],
      cur: Array[(Long, Array[Double])],
      prev: Option[Array[(Long, Array[Double])]]): StepResult = {
    val dim = cur.head._2.length
    val bc = sp.sparkContext.broadcast((cur, prev))
    val partials = corpus.mapPartitions { it =>
      val (c, p) = bc.value
      val curAD = toArrayData(c)
      val prevAD = p.map(toArrayData)
      val idx = c.map(_._1).zipWithIndex.toMap
      val sums = Array.fill(c.length)(new Array[Long](dim))
      val ns = new Array[Long](c.length)
      var moved = 0L
      it.foreach { row =>
        val v = row.getArray(1)
        val cid = NearestCellUtil.nearest(v, curAD)
        prevAD.foreach { pa =>
          if (NearestCellUtil.nearest(v, pa) != cid) moved += 1
        }
        val i = idx(cid)
        ns(i) += 1
        val mi = row.getArray(2)
        var d = 0
        while (d < dim) { sums(i)(d) += mi.getInt(d); d += 1 }
      }
      Iterator((sums, ns, moved))
    }.collect()
    bc.destroy()
    val dim2 = dim
    val k = cur.length
    val sums = Array.fill(k)(new Array[Long](dim2))
    val ns = new Array[Long](k)
    var moved = 0L
    partials.foreach { case (s, n, m) =>
      moved += m
      var i = 0
      while (i < k) {
        ns(i) += n(i)
        var d = 0
        while (d < dim2) { sums(i)(d) += s(i)(d); d += 1 }
        i += 1
      }
    }
    val cells = (0 until k).iterator
      .filter(i => ns(i) > 0)
      .map(i => Cell(cur(i)._1, ns(i), sums(i)))
      .toArray
    StepResult(cells, moved)
  }
}
