package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String-array twin of [[TrigramSimUtil]]: the distinct character
  * 3-grams of the lowercased string AS STRINGS (first-appearance
  * order), for the paths that need the set itself — the trigram
  * prefilter's `arrays_overlap` and the trigram posting-index build
  * — rather than a similarity. Code-POINT extraction, matching the
  * composed `split(lc, "")` form for supplementary characters. */
object TrigramsUtil {

  def trigrams(s: UTF8String): ArrayData = {
    val lc = s.toLowerCase.toString
    val cps = lc.codePoints().toArray
    val n = cps.length
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n - 2) {
      sb.setLength(0)
      sb.appendCodePoint(cps(i))
        .appendCodePoint(cps(i + 1))
        .appendCodePoint(cps(i + 2))
      seen.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }
}

/** Native trigram-set expression (reference: the trigram sets behind
  * db/init.sql:31-32 gin_trgm_ops). The composed form is a char
  * split + two zip_with shifts + array_distinct + slice, all
  * interpreted; this is one fused pass that stays inside whole-stage
  * codegen. Bit-identical content and order to the composed form
  * (TextFunctionsSpec). */
case class Trigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"trigrams expects string, got ${other.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    TrigramsUtil.trigrams(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TrigramsUtil.trigrams($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Trigrams = copy(child = newChild)

  override def prettyName: String = "trigrams"
}

object Trigrams {
  /** Column-facing constructor: `trigrams($"name")`. */
  def apply(c: Column): Column =
    GraftBridge.column(Trigrams(GraftBridge.expression(c)))
}
