package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rewrite: the canonical top-N-per-group window pattern
  *
  * {{{ filter(row_number() OVER (PARTITION BY p ORDER BY s) <= k) }}}
  *
  * becomes a bounded [[TopKRows]] aggregate + posexplode + projection
  * with IDENTICAL output (columns, names, exprIds, and the rank
  * column reconstructed from the explode position).
  *
  * Why: the window plan shuffles EVERY input row to its group's
  * reducer and sorts whole groups — at 100 TB with a hot or
  * low-cardinality partition key that is the classic scale killer
  * (round 1's knn-join was exactly this). The aggregate form ships at
  * most k rows per group per task (map-side partial top-k), the same
  * fix `TakeOrderedAndProject` applies to global top-k. Users keep
  * writing the natural declarative window query; the engine plans
  * the bounded aggregate — registered through
  * [[graft.GraftExtensions]] `injectOptimizerRule`, disable with
  * `spark.sql.optimizer.excludedRules=graft.plans.TopKWindowRewrite`.
  *
  * Fires only on the exact shape it can prove equivalent:
  * single row_number window expression, partition/order keys that
  * are plain attributes of the window child, and a `rn <= k` /
  * `rn < k` filter directly above (optionally through a
  * pass-through projection). Ties in the ordering are resolved
  * deterministically by the aggregate's comparator; the window form
  * leaves tie order partition-dependent, so only queries with a
  * total order (unique tiebreak) are deterministic either way. Since
  * the rule fires on EVERY session built with GraftExtensions, it is
  * also gated behind `spark.graft.topkWindowRewrite.enabled`
  * (default true) — a runtime conf toggle, coarser-grained but
  * settable per-query, alongside the standard
  * `spark.sql.optimizer.excludedRules` escape hatch.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  /** Runtime toggle (default on): `SET
    * spark.graft.topkWindowRewrite.enabled=false` restores the
    * window plan — e.g. for queries whose ORDER BY is not a total
    * order, where the two plans may keep different tied rows (both
    * orders are legal; see the tie caveat above). */
  val EnabledKey = "spark.graft.topkWindowRewrite.enabled"

  /** Above this k the rewrite declines: the bounded buffer holds up
    * to 2k rows per group in memory, while the window plan's
    * sort-based execution can spill — for huge rank cuts the window
    * is the safer plan. */
  val MaxK = 8192

  private object RnLimit {
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType)) =>
        Some((a, v))
      case LessThan(a: Attribute, Literal(v: Int, IntegerType)) =>
        Some((a, v - 1))
      case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute) =>
        Some((a, v))
      case GreaterThan(Literal(v: Int, IntegerType), a: Attribute) =>
        Some((a, v - 1))
      // rn = 1 — the ubiquitous keep-first-row-per-group filter.
      // (rn = v for v > 1 keeps ONLY rank v, which is not a top-k.)
      case EqualTo(a: Attribute, Literal(1, IntegerType)) => Some((a, 1))
      case EqualTo(Literal(1, IntegerType), a: Attribute) => Some((a, 1))
      case _ => None
    }
  }

  /** The single row_number alias of a rewritable window, if any. */
  private def rnAlias(w: Window, rn: Attribute): Option[Alias] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber, _), _))
          if a.exprId == rn.exprId &&
            w.partitionSpec.forall(_.isInstanceOf[Attribute]) &&
            w.orderSpec.nonEmpty &&
            w.orderSpec.forall(_.child.isInstanceOf[Attribute]) &&
            w.orderSpec.forall(so => w.child.outputSet.contains(
              so.child.asInstanceOf[Attribute])) =>
        Some(a)
      case _ => None
    }

  private def passThrough(projList: Seq[NamedExpression]): Boolean =
    projList.forall(_.isInstanceOf[Attribute])

  def apply(plan: LogicalPlan): LogicalPlan = if (
    !conf.getConfString(EnabledKey, "true").toBoolean) plan
  else plan transformUp {
    case f @ Filter(RnLimit(rn, k), w: Window)
        if k >= 1 && k <= MaxK && rnAlias(w, rn).isDefined =>
      rewrite(w, rnAlias(w, rn).get, k, f.output)

    case f @ Filter(RnLimit(rn, k), Project(projList, w: Window))
        if k >= 1 && k <= MaxK && passThrough(projList) &&
          rnAlias(w, rn).isDefined =>
      rewrite(w, rnAlias(w, rn).get, k, f.output)
  }

  /** Build Aggregate(TopKRows) → Generate(posexplode) → Project with
    * the original output attributes (same exprIds). */
  private def rewrite(w: Window, rn: Alias, k: Int,
      out: Seq[Attribute]): LogicalPlan = {
    val child = w.child
    val childOut = child.output

    val struct = CreateStruct(childOut)
    val orderAttrs = w.orderSpec.map(_.child.asInstanceOf[Attribute])
    val keyIdx = orderAttrs.map(a => childOut.indexWhere(_.exprId == a.exprId))
    val asc = w.orderSpec.map(_.direction == Ascending)
    val nf = w.orderSpec.map(_.nullOrdering == NullsFirst)

    val groupAttrs = w.partitionSpec.map(_.asInstanceOf[Attribute])
    val tk = Alias(
      TopKRows(struct, keyIdx, asc, nf, k).toAggregateExpression(),
      "__topk")()
    val agg = Aggregate(groupAttrs, groupAttrs :+ tk, child)

    val structT = struct.dataType
    val posAttr = AttributeReference("__pos", IntegerType, nullable = false)()
    val rowAttr = AttributeReference("__row", structT, nullable = false)()
    val gen = Generate(PosExplode(tk.toAttribute),
      unrequiredChildIndex = agg.output.indices, // everything comes from the struct
      outer = false, qualifier = None,
      generatorOutput = Seq(posAttr, rowAttr), agg)

    val byId = childOut.zipWithIndex.map { case (a, i) => a.exprId -> i }.toMap
    val projections = out.map { a =>
      if (a.exprId == rn.exprId) {
        Alias(Add(posAttr, Literal(1)), a.name)(exprId = a.exprId)
      } else {
        val i = byId(a.exprId)
        Alias(GetStructField(rowAttr, i, Some(childOut(i).name)), a.name)(
          exprId = a.exprId, qualifier = a.qualifier)
      }
    }
    Project(projections, gen)
  }
}
