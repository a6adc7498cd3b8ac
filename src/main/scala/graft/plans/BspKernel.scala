package graft.plans

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** The shared executor behind the converged whole-graph rows
  * (q_rank_converged's damped power iteration, q_graph_cc's min-label
  * propagation) — the GraphX/Pregel shape (co-partitioned adjacency +
  * per-node long state, one key exchange per superstep), executed
  * below the DataFrame API for the same measured reason as
  * [[KmeansKernel]]: a data-dependent iterative loop cannot reuse one
  * compiled plan, so each DataFrame step paid 0.15-0.25 s of fresh
  * Catalyst analysis against ~40 ms of work, ×~20 convergence steps.
  * Unlike k-means the state here is O(nodes) and stays DISTRIBUTED:
  * states live partitioned on the same [[HashPartitioner]] as the
  * grouped adjacency, so the message join and the rebuild join are
  * narrow, and the ONLY exchange per superstep is the message
  * `reduceByKey`.
  *
  * The algorithm is three specialized-on-Long closures — `emit` (a
  * node's outgoing message, from its state and out-degree), `combine`
  * (the message semigroup: sum for rank mass, min for labels) and
  * `rebuild` (next state from previous state + combined inbox) — so
  * every update stays pure long arithmetic mirroring each row's
  * graded expression exactly and there is no numeric seam at all;
  * GraphSpec pins each user's stop rule, delta trace, and converged
  * states against a driver-side unroll, and the unrolled DuckDB
  * oracles grade the full rows.
  *
  * Lineage discipline: each step's states persist (MEMORY_AND_DISK)
  * and cut lineage — reliable `checkpoint()` when
  * `graft.checkpoint.dir` is set (the [[graft.Checkpoints]] policy),
  * `localCheckpoint()` otherwise; the superseded step unpersists.
  */
object BspKernel {

  /** Node-state partition sizing: one partition per this many nodes
    * (the [[graft.streaming.Streaming.StatePartitionsKey]]
    * discipline — state partitions track the KEY SPACE, not the CPU
    * count). ~20 supersteps × 2 stages × partitions tasks is the
    * loop's scheduling bill, and a 100k-node graph is ~1.6 MB of
    * state: at the session default of 32 partitions the bill was 64
    * near-empty tasks per step (~0.12 s/step measured); right-sized
    * it is a handful. A 100 TB graph raises the count with its node
    * space (or pins it via [[PartitionsKey]]). */
  val NodesPerPartition = 65536L

  /** Explicit override for the node-state partition count. */
  val PartitionsKey = "graft.rank.partitions"

  /** Run an integer BSP iteration to the first superstep whose max
    * per-node |Δstate| is ≤ `tol`. Returns (converged states, stop
    * iteration, per-iteration max-|Δ| trace). Throws past
    * `maxIters` while still above `tol`. `nNodes` sizes the state
    * partitioning (callers know it from a metadata-only count).
    * `edges` is directed message flow — callers pass both directions
    * for undirected propagation. Nodes with an empty inbox rebuild
    * with `hasInbox = false` and the inbox argument 0.
    *
    * PRECONDITION: every edge endpoint (src AND dst) must appear in
    * `nodes`. A src outside `nodes` fails loudly in the message
    * stage (below); a dst outside `nodes` has no state row to
    * rebuild, so its messages are dropped by the rebuild
    * zipPartitions — callers own the closure over their node set. */
  def converge(sp: SparkSession, edges: RDD[(Long, Long)],
      nodes: RDD[Long], nNodes: Long, tol: Long, maxIters: Int,
      init: Long => Long, emit: (Long, Int) => Long,
      combine: (Long, Long) => Long,
      rebuild: (Long, Long, Boolean) => Long):
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
    var states = cut(nodeR.mapPartitions(_.map { case (id, _) =>
      (id, init(id))
    }, preservesPartitioning = true))
    states.count()
    val trace = scala.collection.mutable.ArrayBuffer[Long]()
    var t = 0
    while (true) {
      t += 1
      if (t > maxIters)
        throw new IllegalStateException(
          s"BSP iteration still moving > $tol after " +
            s"$maxIters supersteps — raise the cap for this graph")
      // Message exchange: per-partition primitive-map lookup of each
      // source's state (zipPartitions — adj and states share `part`,
      // so this is the narrow join without cogroup buffering), then
      // THE step shuffle. preservesPartitioning MUST stay false
      // here: the emitted pairs are keyed by DESTINATION while the
      // inputs are partitioned by SOURCE — claiming the source
      // partitioner would make reduceByKey(part) skip its shuffle
      // and silently drop every message whose dst hashes to a
      // different partition (caught by GraphSpec's
      // partitioning-invariance test; invisible at the graded SFs,
      // whose node counts size to ONE state partition).
      val inbox = adj.zipPartitions(states) { (aIt, sIt) =>
        val sm = scala.collection.mutable.LongMap.empty[Long]
        sIt.foreach { case (id, s) => sm.update(id, s) }
        aIt.flatMap { case (src, dsts) =>
          // Loud contract check: a LongMap miss would otherwise
          // surface as an opaque executor-side NoSuchElementException.
          val m = emit(sm.getOrElse(src, sys.error(
            s"BSP contract violation: edge source $src not in nodes")),
            dsts.length)
          dsts.iterator.map(d => (d, m))
        }
      }.reduceByKey(part, combine)
      // State rebuild + delta, one pass: every node's next state from
      // the combined inbox, |Δ| folded into a max accumulator
      // (idempotent under task retry), so the step's ONLY action is
      // the count that materializes the cut.
      val acc = new MaxAccumulator
      sp.sparkContext.register(acc, s"bsp-delta-$t")
      val prev = states
      val next = cut(nodeR.zipPartitions(inbox, prev,
          preservesPartitioning = true) { (nIt, iIt, pIt) =>
        val im = scala.collection.mutable.LongMap.empty[Long]
        iIt.foreach { case (id, m) => im.update(id, m) }
        val pm = scala.collection.mutable.LongMap.empty[Long]
        pIt.foreach { case (id, s) => pm.update(id, s) }
        nIt.map { case (id, _) =>
          val p = pm(id)
          val s = im.get(id) match {
            case Some(m) => rebuild(p, m, true)
            case None => rebuild(p, 0L, false)
          }
          acc.add(math.abs(s - p))
          (id, s)
        }
      })
      next.count()
      // Clamp: with an empty node set (reachable from the CC
      // contraction when a batch merges nothing) no task ever adds to
      // the accumulator and acc.value is Long.MinValue — convergence
      // is still correct (MinValue ≤ tol) but the returned trace must
      // stay a valid non-negative |Δ| sequence.
      val mx = math.max(acc.value, 0L)
      trace += mx
      prev.unpersist(blocking = false)
      // unpersist only frees storage blocks; the superseded step's
      // reliable-checkpoint FILES would otherwise accumulate (~20 per
      // converge() call) unless the deployment sets
      // spark.cleaner.referenceTracking.cleanCheckpoints — delete
      // them here, now that `next` is materialized AND checkpointed
      // (its lineage no longer references prev). The FINAL step's
      // checkpoint is the returned RDD's backing data and is kept.
      prev.getCheckpointFile.foreach { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        path.getFileSystem(sp.sparkContext.hadoopConfiguration)
          .delete(path, true)
      }
      states = next
      if (mx <= tol) {
        // The converged states are checkpointed (lineage truncated),
        // so the loop's working set can release its storage blocks
        // now instead of waiting for a driver GC to trigger the
        // ContextCleaner — adjacency is the largest structure here.
        adj.unpersist(blocking = false)
        nodeR.unpersist(blocking = false)
        return (states, t, trace.toSeq)
      }
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
