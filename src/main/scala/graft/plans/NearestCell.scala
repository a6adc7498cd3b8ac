package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused argmin kernel shared by codegen and interpreted eval. */
object NearestCellUtil {

  /** Sentinel for "no usable centroid" — both eval paths turn it
    * into SQL NULL. (A real cid of Long.MinValue would collide; cids
    * in this engine are non-negative row ids.) */
  val NoCell: Long = Long.MinValue

  /** Id of the centroid with the smallest squared euclidean distance
    * to `v`; ties break to the smaller id. Distance is a strict
    * left-to-right fold of `(v(i)-c(i))²` additions — bit-identical
    * to the composed `dist2Builtin` + `min(struct(d, cid))`
    * formulation (asserted in NearestCellSpec) and to the DuckDB
    * `list_sum` comprehension the oracle runs.
    *
    * Malformed input guards (`containsNull` metadata is sticky on
    * arrays built by collect_list et al., so runtime checks beat
    * type-check rejection): null array elements, null cid/cvec
    * struct fields are SKIPPED; a centroid vector shorter than the
    * query contributes only its shared prefix (inner loop bounded by
    * min(dim, |cv|)); null elements inside either vector are skipped
    * (contribution 0). Returns [[NoCell]] when no usable centroid
    * remains. */
  def nearest(v: ArrayData, cents: ArrayData): Long = {
    val dim = v.numElements()
    var found = false
    var bestId = Long.MaxValue
    var bestD = Double.PositiveInfinity
    var minId = Long.MaxValue
    var any = false
    var i = 0
    val n = cents.numElements()
    while (i < n) {
      if (!cents.isNullAt(i)) {
        val c = cents.getStruct(i, 2)
        if (!c.isNullAt(0) && !c.isNullAt(1)) {
          val cid = c.getLong(0)
          val cv = c.getArray(1)
          if (cid < minId) { minId = cid; any = true }
          var acc = 0.0d
          var j = 0
          val m = math.min(dim, cv.numElements())
          while (j < m) {
            if (!v.isNullAt(j) && !cv.isNullAt(j)) {
              val d = v.getDouble(j) - cv.getDouble(j)
              acc += d * d
            }
            j += 1
          }
          if (acc < bestD || (acc == bestD && cid < bestId)) {
            found = true
            bestD = acc
            bestId = cid
          }
        }
      }
      i += 1
    }
    // All distances NaN (a NaN vector component): every comparison is
    // false and nothing was picked. Match the composed
    // min(struct(d, cid)) semantics — equal keys fall through to the
    // cid tiebreak — instead of leaking the Long.MaxValue sentinel.
    if (found) bestId else if (any) minId else NoCell
  }
}

/** Native nearest-centroid assignment: `nearest_cell(vec, cents)`
  * where `cents` is an `array<struct<cid: bigint, cvec:
  * array<double>>>` (the broadcast centroid table collapsed to one
  * array row). Returns the cid minimizing squared euclidean
  * distance, ties to the smaller cid.
  *
  * This is what makes an IVF/KMeans assignment pass MAP-ONLY: the
  * per-row argmin over k broadcast centroids runs as one fused loop
  * inside whole-stage codegen, where the compositional alternative —
  * crossJoin(centroids) + `groupBy(vec_id).agg(min(struct(d, cid)))`
  * — shuffles the ENTIRE corpus (embeddings included) through a
  * k×-amplified exchange. At 100 TB the shuffle formulation moves
  * 100 TB × k rows; this expression moves nothing. (Reference
  * intent: the HNSW/ANN index of db/init.sql:50-52 — IVF is the
  * quantizer family that scales it out.)
  */
case class NearestCell(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(StructType(Array(f0, f1)), _))
          if f0.dataType == LongType &&
            (f1.dataType match {
              case ArrayType(DoubleType, _) => true
              case _ => false
            }) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "nearest_cell expects (array<double>, " +
          "array<struct<cid: bigint, cvec: array<double>>>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(v: Any, cents: Any): Any = {
    val ca = cents.asInstanceOf[ArrayData]
    val r = NearestCellUtil.nearest(v.asInstanceOf[ArrayData], ca)
    if (r == NearestCellUtil.NoCell) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"""long ${ev.value}_r = graft.plans.NearestCellUtil.nearest($v, $c);
         |if (${ev.value}_r == Long.MIN_VALUE) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCell =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "nearest_cell"
}

object NearestCell {
  /** Column-facing constructor. */
  def apply(v: Column, cents: Column): Column =
    GraftBridge.column(
      NearestCell(GraftBridge.expression(v), GraftBridge.expression(cents)))
}
