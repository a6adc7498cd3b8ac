package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Shared kernels for the per-token array folds — the last
  * interpreted higher-order functions that ran once per token over
  * the whole corpus (HOFs never enter whole-stage codegen; each
  * element paid closure dispatch, exactly the profile the
  * [[WordShingles]]/[[Trigrams]]/[[PqEncode]] kernels removed).
  * A third candidate (per-element md5-prefix60 over shingle arrays)
  * measured 0.9× vs the composed `transform` — the md5 inside the
  * lambda is already native and dominates — so it was not adopted
  * (SURVEY §6). */
object TokenKernelsUtil {

  /** Max frequency of any element — semantics of the composed
    * `aggregate(sort_array(toks), run-length struct fold)` form
    * ([[graft.operators.TextAnalysis.maxWordFreqBuiltin]]): the
    * longest equal-run of the sorted array, which for exact equality
    * is the max multiplicity, counted here with one hash map instead
    * of a sort + per-element struct allocation. Null elements sort
    * into runs of length 1 in the composed fold (`null === w` is
    * never true), so each contributes a candidate run of 1. */
  def maxFreq(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val m = new java.util.HashMap[AnyRef, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { if (best < 1) best = 1 }
      else {
        val c = m.merge(arr.getUTF8String(i), Integer.valueOf(1),
          (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
        if (c.intValue > best) best = c.intValue
      }
      i += 1
    }
    best.toLong
  }

  /** Rabin-Karp fold over the token array — semantics of the
    * composed `aggregate(transform(toks, md5_prefix60(t) % hashMod),
    * 0, (acc, x) -> (acc·b + x) % m)` form: one pass, digest bytes
    * straight to the accumulator. Returns null (boxed) if any
    * element is null, exactly as the composed fold's null
    * propagation does. */
  def rollingFp(arr: ArrayData, hashMod: Long, b: Long, m: Long): Any = {
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val x = Md5Prefix60Expr.compute(arr.getUTF8String(i)) % hashMod
      acc = (acc * b + x) % m
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

}

private[plans] trait StringArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    self.child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"${self.prettyName} expects array<string>, got ${other.catalogString}")
    }
}

/** Native max-token-frequency: `max_token_freq(toks)` — the
  * Gopher-style repetition signal's per-doc kernel (one hash-map
  * pass; the composed form sorted the array and folded a struct
  * accumulator per element, interpreted). Value-identical to the
  * composed fold (TokenKernelsSpec). */
case class MaxTokenFreq(child: Expression)
    extends UnaryExpression with StringArrayInput {

  override def dataType: DataType = LongType

  override def nullSafeEval(arr: Any): Any =
    TokenKernelsUtil.maxFreq(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenKernelsUtil.maxFreq($c)")

  override protected def withNewChildInternal(
      newChild: Expression): MaxTokenFreq = copy(child = newChild)

  override def prettyName: String = "max_token_freq"
}

object MaxTokenFreq {
  def apply(toks: Column): Column =
    GraftBridge.column(MaxTokenFreq(GraftBridge.expression(toks)))
}

/** Native rolling fingerprint: `rolling_fp(toks, hashMod, b, m)` —
  * the order-sensitive Rabin-Karp document fingerprint as one fused
  * pass (hash + fold; the composed form paid two interpreted HOFs
  * per token). Bit-identical to the composed fold
  * (TokenKernelsSpec). */
case class RollingFp(child: Expression, hashMod: Long, b: Long, m: Long)
    extends UnaryExpression with StringArrayInput {

  override def dataType: DataType = LongType

  // Null ELEMENTS produce a null result (matching the composed
  // fold's null propagation), so the expression is nullable even
  // over a non-null array column.
  override def nullable: Boolean = true

  override def nullSafeEval(arr: Any): Any =
    TokenKernelsUtil.rollingFp(arr.asInstanceOf[ArrayData], hashMod, b, m)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("rfp")
      s"""Object $tmp = graft.plans.TokenKernelsUtil.rollingFp(
         |  $c, ${hashMod}L, ${b}L, ${m}L);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $tmp).longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RollingFp = copy(child = newChild)

  override def prettyName: String = "rolling_fp"
}

object RollingFp {
  def apply(toks: Column, hashMod: Long, b: Long, m: Long): Column =
    GraftBridge.column(
      RollingFp(GraftBridge.expression(toks), hashMod, b, m))
}

