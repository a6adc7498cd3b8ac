package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused product-quantization encoder shared by codegen and
  * interpreted eval. */
object PqEncodeUtil {

  /** Codes (codebook POSITIONS, 0-based) for `v` against `cb` =
    * array<struct<sid, sv: array<double>>>: for each of `pqM`
    * subspaces of width `pqSub`, the position j minimizing the
    * strict left-to-right fold of `(v(i)-sv(i))²` over the subspace,
    * ties to the smaller j. Comparison is `java.lang.Double.compare`
    * (NaN greatest, NaN == NaN), which is exactly the composed
    * `array_min(struct(d, j))` ordering — an all-NaN subspace
    * yields j = 0 on both paths (asserted in PqEncodeSpec).
    *
    * Malformed-input guards mirror [[NearestCellUtil.nearest]]
    * (runtime skip beats type-check rejection, because containsNull
    * metadata is sticky on built arrays): null/short vectors bound
    * the inner loop, null elements contribute 0, null codebook
    * entries or null sv fields keep their position but never win. */
  def encode(v: ArrayData, cb: ArrayData, pqM: Int, pqSub: Int): ArrayData = {
    val n = cb.numElements()
    val vd = v.numElements()
    val out = new Array[Any](pqM)
    var m = 0
    while (m < pqM) {
      val base = m * pqSub
      var bestJ = 0
      var bestD = Double.NaN
      var first = true
      var j = 0
      while (j < n) {
        if (!cb.isNullAt(j)) {
          val s = cb.getStruct(j, 2)
          if (!s.isNullAt(1)) {
            val sv = s.getArray(1)
            var acc = 0.0d
            var i = base
            val end = math.min(math.min(base + pqSub, vd), sv.numElements())
            while (i < end) {
              if (!v.isNullAt(i) && !sv.isNullAt(i)) {
                val d = v.getDouble(i) - sv.getDouble(i)
                acc += d * d
              }
              i += 1
            }
            if (first || java.lang.Double.compare(acc, bestD) < 0) {
              first = false
              bestD = acc
              bestJ = j
            }
          }
        }
        j += 1
      }
      out(m) = bestJ
      m += 1
    }
    new GenericArrayData(out)
  }
}

/** Native PQ encoder: `pq_encode(vec, cb)` — the map-only pass that
  * turns every corpus vector into PqM codebook positions (reference
  * role: the compression tier under db/init.sql:50-58's HNSW; see
  * Ann.pqTopK). The composed form is PqM × PqK interpreted
  * slice+zip_with+aggregate folds plus a struct array_min per
  * subspace (~128 interpreted folds and as many array allocations
  * per row); this is one fused loop in whole-stage codegen.
  * Bit-identical to the composed form (PqEncodeSpec, codegen and
  * interpreted, real + adversarial vectors). */
case class PqEncode(left: Expression, right: Expression,
    pqM: Int, pqSub: Int) extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(StructType(fs), _))
          if fs.length == 2 &&
            fs(1).dataType.isInstanceOf[ArrayType] &&
            fs(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects (array<double>, array<struct<id, array<double>>>)" +
          s", got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(v: Any, cb: Any): Any =
    PqEncodeUtil.encode(v.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData], pqM, pqSub)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.plans.PqEncodeUtil.encode($v, $c, $pqM, $pqSub)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_encode"
}

object PqEncode {
  /** Column-facing constructor: `PqEncode(vec, cb, PqM, PqSub)`. */
  def apply(v: Column, cb: Column, pqM: Int, pqSub: Int): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(v),
      GraftBridge.expression(cb), pqM, pqSub))
}
