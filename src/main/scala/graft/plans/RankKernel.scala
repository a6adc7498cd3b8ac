package graft.plans

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** The converged-PageRank executor behind q_rank_converged — the
  * GraphX/Pregel shape (co-partitioned adjacency + rank state, one
  * key exchange per superstep), executed below the DataFrame API for
  * the same measured reason as [[KmeansKernel]]: a data-dependent
  * iterative loop cannot reuse one compiled plan, so each DataFrame
  * step paid 0.15-0.25 s of fresh Catalyst analysis against ~40 ms
  * of work, ×~20 convergence steps. Unlike k-means the state here is
  * O(nodes) and stays DISTRIBUTED: ranks live partitioned on the
  * same [[HashPartitioner]] as the grouped adjacency, so the
  * contribution join and the delta join are narrow, and the ONLY
  * exchange per step is the contribution `reduceByKey`.
  *
  * Every update is pure long arithmetic mirroring the graded
  * expression exactly (`r DIV outdeg`, `150000 + 17·sc DIV 20` —
  * positive-operand truncating division both sides), so there is no
  * numeric seam at all; GraphSpec pins the stop rule, the delta
  * trace, and the converged ranks against a driver-side unroll, and
  * the DuckDB 32-stage unrolled oracle grades the full row.
  *
  * Lineage discipline: each step's ranks persist (MEMORY_AND_DISK)
  * and cut lineage — reliable `checkpoint()` when
  * `graft.checkpoint.dir` is set (the [[graft.Checkpoints]] policy),
  * `localCheckpoint()` otherwise; the superseded step unpersists.
  */
object RankKernel {

  /** Rank-state partition sizing: one partition per this many nodes
    * (the [[graft.streaming.Streaming.StatePartitionsKey]]
    * discipline — state partitions track the KEY SPACE, not the CPU
    * count). ~20 supersteps × 2 stages × partitions tasks is the
    * loop's scheduling bill, and a 100k-node graph is ~1.6 MB of
    * rank state: at the session default of 32 partitions the bill
    * was 64 near-empty tasks per step (~0.12 s/step measured);
    * right-sized it is a handful. A 100 TB graph raises the count
    * with its node space (or pins it via [[PartitionsKey]]). */
  val NodesPerPartition = 65536L

  /** Explicit override for the rank-state partition count. */
  val PartitionsKey = "graft.rank.partitions"

  /** Run damped integer power iteration to the first step whose max
    * per-node |Δrank| is ≤ `tol`. Returns (converged ranks, stop
    * iteration, per-iteration max-|Δ| trace). Throws past
    * `maxIters` while still above `tol`. `nNodes` sizes the state
    * partitioning (callers know it from a metadata-only count). */
  def converge(sp: SparkSession, edges: RDD[(Long, Long)],
      nodes: RDD[Long], nNodes: Long, tol: Long, maxIters: Int):
      (RDD[(Long, Long)], Int, Seq[Long]) = {
    val maxParts = sp.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parts = sp.conf.getOption(PartitionsKey).map(_.toInt).getOrElse(
      math.max(1L, math.min(maxParts.toLong,
        (nNodes + NodesPerPartition - 1) / NodesPerPartition)).toInt)
    val part = new HashPartitioner(parts)
    val reliableDir = sp.conf.getOption(graft.Checkpoints.ConfKey)
      .filter(_.nonEmpty)
    def cut(r: RDD[(Long, Long)]): RDD[(Long, Long)] = {
      r.persist(StorageLevel.MEMORY_AND_DISK)
      if (reliableDir.isDefined) {
        sp.sparkContext.setCheckpointDir(reliableDir.get)
        r.checkpoint()
      } else r.localCheckpoint()
      r
    }
    val adj = edges.groupByKey(part).mapValues(_.toArray)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodeR = nodes.map((_, ())).partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = cut(nodeR.mapValues(_ => 1000000L))
    ranks.count()
    val trace = scala.collection.mutable.ArrayBuffer[Long]()
    var t = 0
    while (true) {
      t += 1
      if (t > maxIters)
        throw new IllegalStateException(
          s"rank iteration still moving > $tol ppm after " +
            s"$maxIters steps — raise RankMaxIters for this graph")
      // Contribution exchange: per-partition primitive-map lookup of
      // each source's rank (zipPartitions — adj and ranks share
      // `part`, so this is the narrow join without cogroup
      // buffering), then THE step shuffle.
      val contribs = adj.zipPartitions(ranks,
          preservesPartitioning = true) { (aIt, rIt) =>
        val rm = scala.collection.mutable.LongMap.empty[Long]
        rIt.foreach { case (id, r) => rm.update(id, r) }
        aIt.flatMap { case (src, dsts) =>
          val c = rm(src) / dsts.length // r DIV outdeg
          dsts.iterator.map(d => (d, c))
        }
      }.reduceByKey(part, _ + _)
      // Rank rebuild + delta, one pass: every node's new rank from
      // the contribution map, |Δ| folded into a max accumulator
      // (idempotent under task retry), so the step's ONLY action is
      // the count that materializes the cut.
      val acc = new MaxAccumulator
      sp.sparkContext.register(acc, s"rank-delta-$t")
      val prev = ranks
      val next = cut(nodeR.zipPartitions(contribs, prev,
          preservesPartitioning = true) { (nIt, cIt, pIt) =>
        val cm = scala.collection.mutable.LongMap.empty[Long]
        cIt.foreach { case (id, sc) => cm.update(id, sc) }
        val pm = scala.collection.mutable.LongMap.empty[Long]
        pIt.foreach { case (id, r) => pm.update(id, r) }
        nIt.map { case (id, _) =>
          val r = 150000L + 17L * cm.getOrElse(id, 0L) / 20L
          acc.add(math.abs(r - pm(id)))
          (id, r)
        }
      })
      next.count()
      val mx = acc.value
      trace += mx
      prev.unpersist(blocking = false)
      ranks = next
      if (mx <= tol) return (ranks, t, trace.toSeq)
    }
    sys.error("unreachable")
  }
}

/** Max-reduce accumulator — safe under task retry/speculation
  * because max is idempotent over re-added partials. */
class MaxAccumulator
    extends org.apache.spark.util.AccumulatorV2[Long, Long] {
  private var mx = Long.MinValue
  override def isZero: Boolean = mx == Long.MinValue
  override def copy(): MaxAccumulator = {
    val c = new MaxAccumulator; c.mx = mx; c
  }
  override def reset(): Unit = mx = Long.MinValue
  override def add(v: Long): Unit = if (v > mx) mx = v
  override def merge(
      other: org.apache.spark.util.AccumulatorV2[Long, Long]): Unit =
    if (other.value > mx) mx = other.value
  override def value: Long = mx
}
