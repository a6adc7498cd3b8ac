package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

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

  /** Sliding W-token span hashes over a raw text column — semantics
    * of `transform(sequence(1, n-W+1), p -> md5_prefix60(
    * concat_ws(' ', slice(split(text, ' '), p, W))))`. Key identity:
    * splitting on a single space and rejoining with a single space
    * reconstructs ANY string exactly (empty tokens from doubled
    * spaces round-trip), so every span STRING is a byte-range
    * substring of the original text between token boundaries — the
    * kernel scans the UTF-8 bytes once for space positions (0x20
    * never occurs inside a multibyte sequence) and feeds each span's
    * byte range straight to the digest: zero per-span string
    * allocation where the composed form built every span via an
    * interpreted slice + concat per position. */
  def spanHashes(text: UTF8String, w: Int): ArrayData = {
    val b = text.getBytes
    // Token starts: 0 plus every position after a space.
    var spaces = 0
    var i = 0
    while (i < b.length) { if (b(i) == ' ') spaces += 1; i += 1 }
    val n = spaces + 1
    val nSpans = n - w + 1
    if (nSpans <= 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    starts(0) = 0
    var t = 0
    i = 0
    while (i < b.length) {
      if (b(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = b.length
    val md = Md5Prefix60Expr.ranged()
    val out = new Array[Long](nSpans)
    i = 0
    while (i < nSpans) {
      out(i) = Md5Prefix60Expr.computeRange(
        md, b, starts(i), ends(i + w - 1) - starts(i))
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
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

  /** Distinct terms of a token array with occurrence counts, in
    * first-occurrence order — semantics of the composed
    * `transform(array_distinct(toks), t -> struct(t,
    * size(filter(toks, x -> x === t))))` posting projection in
    * [[graft.streaming.Streaming.streamIndexOver]], but ONE hash-map
    * pass where the composed form re-scans the whole array per
    * DISTINCT term: O(len) vs O(len × distinct) per doc — quadratic
    * on long documents (the r9 verdict's worst non-stream-machinery
    * marginal). Null elements replicate the composed form exactly:
    * `null === x` is never true, so a null token yields one
    * (null, 0) posting. */
  def termFreqs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]](n * 2)
    var i = 0
    while (i < n) {
      val t = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      val c = m.get(t)
      if (c == null)
        // clone: the lookup string may point into a reusable buffer;
        // only the one retained copy per distinct term pays it.
        m.put(if (t == null) null else t.clone(),
          Array(if (t == null) 0L else 1L))
      else if (t != null) c(0) += 1
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Occurrence-weighted intersection of a SORTED long-hash array
    * (duplicates allowed) against one test's postings — `keys` sorted
    * distinct, `cnts` aligned: Σ over doc elements that match a key
    * of that key's count. Semantics of the map-lookup fold
    * `aggregate(sngs, 0L, (acc, g) -> acc + coalesce(m[g], 0L))`
    * in [[graft.streaming.Streaming.streamContaminationOver]], but
    * one O(n+m) two-pointer merge over longs where `element_at` on a
    * Catalyst map is a linear key scan PER ELEMENT (O(n·m) string
    * compares — measured 6 s of the suite's sf0.1 marginal). */
  def sortedPairCount(doc: ArrayData, keys: ArrayData,
      cnts: ArrayData): Long = {
    val n = doc.numElements()
    val m = keys.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < n && j < m) {
      val d = doc.getLong(i)
      val k = keys.getLong(j)
      if (d < k) i += 1
      else if (d > k) j += 1
      else { acc += cnts.getLong(j); i += 1 } // doc dups re-hit key j
    }
    acc
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

/** Native sliding-span hashes: `span_hashes(text, w)` — the span
  * enumeration under substring-level dedup as one byte-scan + W-token
  * range digests per row (the composed form paid an interpreted
  * slice + concat_ws + md5 per span position). Bit-identical to the
  * composed form (TokenKernelsSpec). */
case class SpanHashes(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, "span width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(text: Any): Any =
    TokenKernelsUtil.spanHashes(
      text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TokenKernelsUtil.spanHashes($c, $w)")

  override protected def withNewChildInternal(
      newChild: Expression): SpanHashes = copy(child = newChild)

  override def prettyName: String = "span_hashes"
}

object SpanHashes {
  def apply(text: Column, w: Int): Column =
    GraftBridge.column(SpanHashes(GraftBridge.expression(text), w))
}

/** Native term-frequency postings: `term_freqs(toks)` →
  * array<struct<term, tf>> in first-occurrence order — the per-doc
  * posting-delta kernel of the streaming text index. Value-identical
  * to the composed array_distinct + per-term filter-count form
  * (TokenKernelsSpec), linear in doc length where the composed form
  * is O(len × distinct). */
case class TermFreqs(child: Expression)
    extends UnaryExpression with StringArrayInput {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = true),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(arr: Any): Any =
    TokenKernelsUtil.termFreqs(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TokenKernelsUtil.termFreqs($c)")

  override protected def withNewChildInternal(
      newChild: Expression): TermFreqs = copy(child = newChild)

  override def prettyName: String = "term_freqs"
}

object TermFreqs {
  def apply(toks: Column): Column =
    GraftBridge.column(TermFreqs(GraftBridge.expression(toks)))
}

/** Native sorted-merge pair count: `sorted_pair_count(doc, keys,
  * cnts)` — the per-(doc, test) shared-shingle-occurrence kernel of
  * the streaming contamination guard. All three inputs are
  * array<bigint>; `doc` sorted ascending (dups allowed), `keys`
  * sorted distinct with `cnts` aligned. Value-identical to the
  * map-lookup fold it replaces (TokenKernelsSpec). */
case class SortedPairCount(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(first, second, third).map(_.dataType).zipWithIndex.collectFirst {
      case (other, i) if !other.isInstanceOf[ArrayType] ||
          other.asInstanceOf[ArrayType].elementType != LongType =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName argument ${i + 1} expects array<bigint>, " +
            s"got ${other.catalogString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def dataType: DataType = LongType

  override def nullSafeEval(doc: Any, keys: Any, cnts: Any): Any =
    TokenKernelsUtil.sortedPairCount(doc.asInstanceOf[ArrayData],
      keys.asInstanceOf[ArrayData], cnts.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, k, c) =>
      s"graft.plans.TokenKernelsUtil.sortedPairCount($d, $k, $c)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SortedPairCount =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "sorted_pair_count"
}

object SortedPairCount {
  def apply(doc: Column, keys: Column, cnts: Column): Column =
    GraftBridge.column(SortedPairCount(GraftBridge.expression(doc),
      GraftBridge.expression(keys), GraftBridge.expression(cnts)))
}

