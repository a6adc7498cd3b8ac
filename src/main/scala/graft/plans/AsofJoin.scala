package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** Logical as-of join: for every left row, the most recent right row
  * with the same key at-or-before the left timestamp (ties: highest
  * right id). Appends `matched_us` / `matched_id` (nullable longs)
  * to the left output.
  *
  * This is the whole-operator tier of the custom-operator ladder —
  * a first-class plan node rather than a DataFrame encoding — so the
  * planner owns the physical strategy: [[AsofJoinExec]] declares
  * hash-clustered distribution + (key, ts, id) ordering requirements
  * and merges both sorted streams in one pass per partition.
  * Key/ts/id columns are referenced by NAME over the children's
  * outputs (resolved at construction; all three must be LongType —
  * timestamps as epoch micros).
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    lKey: String, lTs: String, lId: String,
    rKey: String, rTs: String, rId: String,
    matchedUs: AttributeReference, matchedId: AttributeReference)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ Seq(matchedUs, matchedId)

  // The match columns are GENERATED here, not derived from children —
  // without this CheckAnalysis flags them as missing inputs.
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(Seq(matchedUs, matchedId))

  // The node consumes its key/ts/id columns by NAME; without an
  // explicit references set, ColumnPruning sees no expression using
  // the right child's columns (they are absent from `output`) and
  // prunes the entire right side away.
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output.filter(a => Seq(lKey, lTs, lId).contains(a.name)) ++
        right.output.filter(a => Seq(rKey, rTs, rId).contains(a.name)))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinNode {
  /** Build the node with fresh output attributes for the match
    * columns. */
  def apply(left: LogicalPlan, right: LogicalPlan, lKey: String,
      lTs: String, lId: String, rKey: String, rTs: String,
      rId: String): AsofJoinNode = {
    require(Seq(lKey, lTs, lId).forall(n =>
      left.output.exists(a => a.name == n && a.dataType == LongType)) &&
      Seq(rKey, rTs, rId).forall(n =>
        right.output.exists(a => a.name == n && a.dataType == LongType)),
      "as-of join needs LongType key/ts/id columns on both sides")
    AsofJoinNode(left, right, lKey, lTs, lId, rKey, rTs, rId,
      AttributeReference("matched_us", LongType, nullable = true)(),
      AttributeReference("matched_id", LongType, nullable = true)())
  }
}

/** Physical sort-merge as-of join. Both children are hash-clustered
  * on the key and sorted by (key, ts, id); one forward pass per
  * partition carries the best-so-far right match per key — zero
  * buffering beyond two longs, never a per-key group materialization.
  * At 100 TB this is the same cost shape as one sort-merge equi-join:
  * two key shuffles + local sorts, O(1) state in the merge.
  */
case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    lKey: String, lTs: String, lId: String,
    rKey: String, rTs: String, rId: String,
    matchedUs: AttributeReference, matchedId: AttributeReference)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ Seq(matchedUs, matchedId)

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(Seq(matchedUs, matchedId))

  private def attr(side: SparkPlan, n: String): Attribute =
    side.output.find(_.name == n).get

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(attr(left, lKey))) ::
      ClusteredDistribution(Seq(attr(right, rKey))) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(attr(left, lKey), Ascending),
      SortOrder(attr(left, lTs), Ascending),
      SortOrder(attr(left, lId), Ascending)),
    Seq(SortOrder(attr(right, rKey), Ascending),
      SortOrder(attr(right, rTs), Ascending),
      SortOrder(attr(right, rId), Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  // Left rows pass through unchanged, so the required key clustering
  // survives — advertise it, or every downstream groupBy/join on the
  // key pays a redundant shuffle of the as-of output.
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    import org.apache.spark.sql.catalyst.expressions.Expression
    val lk = BindReferences.bindReference[Expression](attr(left, lKey), left.output)
    val lt = BindReferences.bindReference[Expression](attr(left, lTs), left.output)
    val rk = BindReferences.bindReference[Expression](attr(right, rKey), right.output)
    val rt = BindReferences.bindReference[Expression](attr(right, rTs), right.output)
    val ri = BindReferences.bindReference[Expression](attr(right, rId), right.output)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      new Iterator[InternalRow] {
        private var curKey = 0L
        private var haveKey = false
        private var bestUs = 0L
        private var bestId = 0L
        private var haveBest = false
        private val joined = new JoinedRow
        private val matchRow = new GenericInternalRow(2)

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val kBoxed = lk.eval(l)
          val tsBoxed = lt.eval(l)
          // SQL null semantics: a null key or timestamp matches
          // nothing (never coerce null to 0L — that would join the
          // row against key 0's rows).
          if (kBoxed == null || tsBoxed == null) {
            matchRow.update(0, null); matchRow.update(1, null)
            return joined(l, matchRow)
          }
          val k = kBoxed.asInstanceOf[Long]
          val ts = tsBoxed.asInstanceOf[Long]
          if (!haveKey || k != curKey) {
            curKey = k; haveKey = true; haveBest = false
          }
          // Advance the right side through every row usable by this
          // (and, keys ascending, any later) left row. Null-keyed /
          // null-ts right rows sort first (NullsFirst) and are
          // consumed without ever becoming a match.
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            val rkBoxed = rk.eval(r)
            val rtBoxed = if (rkBoxed == null) null else rt.eval(r)
            if (rkBoxed == null) {
              rBuf.next()
            } else {
              val rkv = rkBoxed.asInstanceOf[Long]
              if (rkv < k || (rkv == k && rtBoxed != null &&
                  rtBoxed.asInstanceOf[Long] <= ts)) {
                if (rkv == k) {
                  // sorted by (ts, id): the last qualifying row is the
                  // (max ts, max id) match
                  bestUs = rtBoxed.asInstanceOf[Long]
                  bestId = ri.eval(r).asInstanceOf[Long]
                  haveBest = true
                }
                rBuf.next()
              } else if (rkv == k && rtBoxed == null) {
                rBuf.next() // null-ts row of this key: skip, no match
              } else advance = false
            }
          }
          if (haveBest) {
            matchRow.update(0, bestUs); matchRow.update(1, bestId)
          } else {
            matchRow.update(0, null); matchRow.update(1, null)
          }
          joined(l, matchRow)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical as-of node to its exec —
  * registered via GraftExtensions `injectPlannerStrategy`. */
object AsofJoinStrategy
    extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsofJoinNode =>
      AsofJoinExec(planLater(n.left), planLater(n.right),
        n.lKey, n.lTs, n.lId, n.rKey, n.rTs, n.rId,
        n.matchedUs, n.matchedId) :: Nil
    case _ => Nil
  }
}
