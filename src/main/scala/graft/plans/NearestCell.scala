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

  /** Id of the centroid with the smallest squared euclidean distance
    * to `v`; ties break to the smaller id. Distance is a strict
    * left-to-right fold of `(v(i)-c(i))²` additions — bit-identical
    * to the composed `dist2Builtin` + `min(struct(d, cid))`
    * formulation (asserted in NearestCellSpec) and to the DuckDB
    * `list_sum` comprehension the oracle runs. */
  def nearest(v: ArrayData, cents: ArrayData): Long = {
    val dim = v.numElements()
    var found = false
    var bestId = Long.MaxValue
    var bestD = Double.PositiveInfinity
    var minId = Long.MaxValue
    var i = 0
    val n = cents.numElements()
    while (i < n) {
      val c = cents.getStruct(i, 2)
      val cid = c.getLong(0)
      val cv = c.getArray(1)
      if (cid < minId) minId = cid
      var acc = 0.0d
      var j = 0
      while (j < dim) {
        val d = v.getDouble(j) - cv.getDouble(j)
        acc += d * d
        j += 1
      }
      if (acc < bestD || (acc == bestD && cid < bestId)) {
        found = true
        bestD = acc
        bestId = cid
      }
      i += 1
    }
    // All distances NaN (a NaN vector component): every comparison is
    // false and nothing was picked. Match the composed
    // min(struct(d, cid)) semantics — equal keys fall through to the
    // cid tiebreak — instead of leaking the Long.MaxValue sentinel.
    if (found) bestId else minId
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
    if (ca.numElements() == 0) null
    else NearestCellUtil.nearest(v.asInstanceOf[ArrayData], ca)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"""if ($c.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.plans.NearestCellUtil.nearest($v, $c);
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
