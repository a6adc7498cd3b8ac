package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused top-2 argmin kernel shared by codegen and interpreted eval. */
object Top2CellsUtil {

  /** The two nearest centroids of `v` ranked by (squared euclidean
    * distance asc, cid asc), as an InternalRow (c1, d1, c2, d2) —
    * null when fewer than two usable centroids exist. The per-
    * centroid distance is the SAME strict left-to-right (v(i)−c(i))²
    * fold as [[NearestCellUtil.nearest]] (and the DuckDB `list_sum`
    * comprehension the oracles run), with the same malformed-input
    * guards, so `c1` here always equals `nearest_cell` and the
    * (d, cid) ranking matches a `row_number() OVER (ORDER BY d ASC,
    * cid ASC)` bit for bit. One loop over the broadcast centroid
    * array — no per-row intermediate arrays, no sort (the
    * compositional transform+array_sort formulation measured 2.5×
    * slower on the SemDeDup assignment pass). */
  def top2(v: ArrayData, cents: ArrayData): GenericInternalRow = {
    val dim = v.numElements()
    var d1 = Double.PositiveInfinity
    var c1 = Long.MaxValue
    var has1 = false
    var d2 = Double.PositiveInfinity
    var c2 = Long.MaxValue
    var has2 = false
    var i = 0
    val n = cents.numElements()
    while (i < n) {
      if (!cents.isNullAt(i)) {
        val c = cents.getStruct(i, 2)
        if (!c.isNullAt(0) && !c.isNullAt(1)) {
          val cid = c.getLong(0)
          val cv = c.getArray(1)
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
          if (!has1 || acc < d1 || (acc == d1 && cid < c1)) {
            d2 = d1; c2 = c1; has2 = has1
            d1 = acc; c1 = cid; has1 = true
          } else if (!has2 || acc < d2 || (acc == d2 && cid < c2)) {
            d2 = acc; c2 = cid; has2 = true
          }
        }
      }
      i += 1
    }
    if (has1 && has2)
      new GenericInternalRow(Array[Any](c1, d1, c2, d2))
    else null
  }
}

/** Native fused top-2 nearest-centroid probe:
  * `top2_cells(vec, cents) -> struct<c1: bigint, d1: double,
  * c2: bigint, d2: double>` over the same broadcast
  * `array<struct<cid, cvec>>` input as [[NearestCell]]. This is the
  * boundary-bridge primitive of the SemDeDup tier: the caller emits
  * the second cell only when `d2 ≤ ratio × d1`, so the distance PAIR
  * has to come out of one map-only pass — two [[NearestCell]] calls
  * would rescan the centroid array and still not expose distances.
  */
case class Top2Cells(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("c1", LongType, nullable = false),
    StructField("d1", DoubleType, nullable = false),
    StructField("c2", LongType, nullable = false),
    StructField("d2", DoubleType, nullable = false)))
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
        "top2_cells expects (array<double>, " +
          "array<struct<cid: bigint, cvec: array<double>>>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(v: Any, cents: Any): Any =
    Top2CellsUtil.top2(
      v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"""InternalRow ${ev.value}_r = graft.plans.Top2CellsUtil.top2($v, $c);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Top2Cells =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "top2_cells"
}

object Top2Cells {
  /** Column-facing constructor. */
  def apply(v: Column, cents: Column): Column =
    GraftBridge.column(
      Top2Cells(GraftBridge.expression(v), GraftBridge.expression(cents)))
}
