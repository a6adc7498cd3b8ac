package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared word-shingle kernel: ordered-distinct n-gram shingles of
  * the space-split token stream, single-space joined — one pass, one
  * LinkedHashSet, no intermediate arrays. */
object WordShinglesUtil {

  /** Exact semantics of the composed HOF form
    * ([[graft.functions.TextFunctions.wordShinglesBuiltin]]):
    * `split(s, " ")` token semantics (consecutive separators yield
    * empty tokens; trailing empties preserved — Java regex split
    * with limit -1), shingles of n consecutive tokens joined by one
    * space, distinct keeping FIRST-appearance order, empty array
    * when fewer than n tokens. */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val L = toks.length
    if (L < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= L - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
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

/** Native word-shingle set expression — the kernel under the
  * MinHash/Jaccard dedup family and the contamination scan
  * (reference for the shingling role: the near-dup detection the
  * reference's oracle-id dedup approximates, SURVEY §2E).
  *
  * The composed form is a fold of interpreted higher-order functions
  * (zip_with shifts + array_distinct + slice) allocating several
  * arrays per row; this expression runs one static kernel call and
  * stays inside whole-stage codegen. Bit-identical output order and
  * content (asserted in TextFunctionsSpec + KernelProperties).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 2, s"word_shingles needs n >= 2, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects string, got ${other.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    WordShinglesUtil.shingles(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.WordShinglesUtil.shingles($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): WordShingles = copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  /** Column-facing constructor: `wordShingles($"text", 3)`. */
  def apply(c: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(c), n))
}
