package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression computing cosine similarity between two
  * array<double> columns in a single fused loop (dot product and both
  * norms accumulated together), with whole-stage codegen via
  * [[doGenCode]].
  *
  * This is the hot path for every similarity operator: the built-in
  * composition `aggregate(zip_with(a, b, _*_), ...)` allocates an
  * intermediate array per row and evaluates three lambda closures; at
  * 100 TB that allocation pressure dominates. The fused loop is
  * branch-free over the vector and stays inside WholeStageCodegen.
  *
  * Semantics mirror pgvector's `<=>` cosine distance operator used by
  * the reference (reference: db/init.sql:50-53 HNSW
  * vector_cosine_ops; db/search_strategies.py:160-168) — we return
  * similarity = 1 - distance directly, accumulated strictly
  * left-to-right in index order so the result is bit-identical to a
  * sequential double fold (the DuckDB oracle computes the same fold).
  *
  * Null/length handling: null if either side is null; 0.0 if either
  * norm is zero or lengths differ (defensive; the corpus is
  * fixed-width).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return 0.0d
    var dot = 0.0d; var na = 0.0d; var nb = 0.0d; var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0d || nb == 0.0d) 0.0d
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.value} = 0.0d; } else {
         |  double $dot = 0.0d; double $na = 0.0d; double $nb = 0.0d;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = $a.getDouble($i);
         |    final double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  ${ev.value} = ($na == 0.0d || $nb == 0.0d)
         |    ? 0.0d : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSimilarity {
  /** Column-facing constructor: `cosineSim($"embedding", $"qvec")`. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      CosineSimilarity(GraftBridge.expression(a),
        GraftBridge.expression(b)))
}
