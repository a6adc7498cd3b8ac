package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared trigram-set kernel: distinct character 3-grams of the
  * lowercased string, each packed into one long (3 × 21-bit Unicode
  * code points — code POINTS, not UTF-16 units, matching the
  * code-point semantics of the composed `split(lc, "")` form for
  * supplementary characters), returned sorted — so set intersection
  * is a two-pointer merge with zero per-row boxing.
  */
object TrigramSimUtil {

  /** Sorted distinct packed trigrams of lower(s). */
  def trigrams(s: UTF8String): Array[Long] = {
    val cps = s.toLowerCase.toString.codePoints().toArray
    val n = cps.length
    if (n < 3) return Array.emptyLongArray
    val out = new Array[Long](n - 2)
    var i = 0
    while (i < n - 2) {
      out(i) = (cps(i).toLong << 42) |
        (cps(i + 1).toLong << 21) | cps(i + 2).toLong
      i += 1
    }
    java.util.Arrays.sort(out)
    var m = 0
    var j = 0
    while (j < out.length) {
      if (m == 0 || out(j) != out(m - 1)) { out(m) = out(j); m += 1 }
      j += 1
    }
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }

  /** |T(a) ∩ T(b)| / |T(a) ∪ T(b)|; 0.0 when both sets are empty.
    * Counts are exact ints, so the double division is bit-identical
    * to the composed `size(intersect)/size(union)` form. */
  def sim(a: UTF8String, b: UTF8String): Double =
    simPre(trigrams(a), b)

  /** [[sim]] with one side's trigram set precomputed. Every real
    * call site compares a column against a literal query string, so
    * the literal's set (lowercase, code-point extraction, sort,
    * dedup) is hoisted out of the per-row loop — the expression
    * caches the foldable side's packed array once per task and calls
    * this. Jaccard is symmetric, so which side is precomputed does
    * not matter. */
  def simPre(ta: Array[Long], b: UTF8String): Double = {
    val tb = trigrams(b)
    var i = 0
    var j = 0
    var inter = 0
    while (i < ta.length && j < tb.length) {
      if (ta(i) == tb(j)) { inter += 1; i += 1; j += 1 }
      else if (ta(i) < tb(j)) i += 1
      else j += 1
    }
    val union = ta.length + tb.length - inter
    if (union == 0) 0.0d else inter.toDouble / union.toDouble
  }
}

/** Native pg_trgm-style trigram-set similarity between two string
  * columns (reference: db/search_strategies.py:96-124
  * `similarity(card_name, q)`, db/init.sql:31 gin_trgm_ops).
  *
  * The composed form (`jaccard(trigrams(a), trigrams(b))` in
  * TextFunctions) is a ~10-node tree of higher-order functions —
  * char split, two zip_with shifts, array_distinct/intersect/union —
  * all interpreted, allocating several string arrays per row. This
  * expression runs one packed-long kernel per row and stays inside
  * whole-stage codegen (static call, no closure dispatch). Results
  * are bit-identical to the composed form (asserted in
  * TrigramSimSpec): same distinct-3-gram sets over the lowercased
  * string, same int counts, same double division.
  */
case class TrigramSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"trigram_sim expects (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  /** The foldable side's trigram set, computed once per expression
    * instance (≙ once per task in the interpreted path) instead of
    * once per row. None when neither side is a constant or the
    * constant is null (the null short-circuits before use anyway). */
  @transient private lazy val foldedSide: Option[(Boolean, Array[Long])] = {
    def pre(e: Expression): Option[Array[Long]] =
      if (e.foldable)
        Option(e.eval()).map(v =>
          TrigramSimUtil.trigrams(v.asInstanceOf[UTF8String]))
      else None
    pre(right).map(a => (true, a)).orElse(pre(left).map(a => (false, a)))
  }

  override def nullSafeEval(l: Any, r: Any): Any = foldedSide match {
    case Some((true, ta)) =>
      TrigramSimUtil.simPre(ta, l.asInstanceOf[UTF8String])
    case Some((false, ta)) =>
      TrigramSimUtil.simPre(ta, r.asInstanceOf[UTF8String])
    case None =>
      TrigramSimUtil.sim(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => foldedSide match {
      // Constant side: bake its packed trigram array into the
      // generated class as a reference object — the per-row code is
      // one static merge-intersect call over the cached array.
      case Some((rightIsConst, ta)) =>
        val ref = ctx.addReferenceObj("trigramsPre", ta, "long[]")
        val varying = if (rightIsConst) a else b
        s"${ev.value} = graft.plans.TrigramSimUtil.simPre($ref, $varying);"
      case None =>
        s"${ev.value} = graft.plans.TrigramSimUtil.sim($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TrigramSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "trigram_sim"
}

object TrigramSim {
  /** Column-facing constructor: `trigramSim($"name", lit(q))`. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      TrigramSim(GraftBridge.expression(a), GraftBridge.expression(b)))
}
