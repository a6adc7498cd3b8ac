package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native random-hyperplane LSH code: bit p of the result =
  * [dot(v, plane_p) >= 0] over `nPlanes` Rademacher (±1) planes,
  * all computed in ONE fused loop with whole-stage codegen.
  *
  * The composed alternative (per plane: `aggregate(zip_with(v, lit))`)
  * builds nPlanes interpreted higher-order-function trees with
  * nPlanes×dim literal leaves — HOFs never enter codegen, every row
  * pays closure dispatch per element, and the huge expression tree
  * slows analysis/compilation too. This expression holds the plane
  * matrix as one flat ±1 reference array and emits a tight nested
  * loop.
  *
  * Accumulation per plane is the same sequential left-to-right
  * product fold as the composed form, so results are bit-identical
  * (asserted in LshSpec) and the DuckDB oracle SQL is unchanged.
  */
case class HyperplaneCode(child: Expression, planes: IndexedSeq[Int], dim: Int)
    extends UnaryExpression {

  // IndexedSeq (not Array) so case-class equality is structural:
  // two identical codes built independently (corpus and probe sides)
  // are semanticEquals and canonicalize/CSE together.
  private val nPlanes: Int = planes.length / dim
  require(planes.length == nPlanes * dim && nPlanes >= 1 && nPlanes <= 63,
    "planes must be nPlanes×dim with 1..63 planes")

  // Flat primitive matrix for the hot loop / codegen reference object.
  @transient private lazy val planeArr: Array[Int] = planes.toArray

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_code expects array<double>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    var code = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0d
      val off = p * dim
      var i = 0
      while (i < n) { dot += v.getDouble(i) * planeArr(off + i); i += 1 }
      if (dot >= 0.0d) code |= 1L << p
      p += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val w = ctx.addReferenceObj("planes", planeArr, "int[]")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val off = ctx.freshName("off")
      s"""
         |final int $n = java.lang.Math.min($dim, $v.numElements());
         |long ${ev.value}Acc = 0L;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double $dot = 0.0d;
         |  final int $off = $p * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $v.getDouble($i) * $w[$off + $i];
         |  }
         |  if ($dot >= 0.0d) ${ev.value}Acc |= 1L << $p;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneCode =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_code"
}

object HyperplaneCode {
  /** Column-facing constructor from a plane matrix (rows = planes). */
  def apply(v: Column, ps: Seq[Seq[Int]]): Column = {
    val dim = ps.head.length
    GraftBridge.column(
      HyperplaneCode(GraftBridge.expression(v), ps.flatten.toIndexedSeq, dim))
  }
}
