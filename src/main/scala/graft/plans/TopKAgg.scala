package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded buffer of the k best (score, id) pairs under the ordering
  * (score DESC, id ASC). Holds at most 2k entries between compactions
  * so memory is O(k) regardless of input size.
  */
final class TopKBuffer(val k: Int) {
  var scores: Array[Double] = new Array[Double](2 * k)
  var ids: Array[Long] = new Array[Long](2 * k)
  var n: Int = 0
  // True iff entries 0..n-1 are sorted by (score desc, id asc) — holds
  // right after compact(); any append invalidates it. The skip test
  // below is only sound against a sorted buffer's true worst entry.
  private var sorted: Boolean = true

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def add(score: Double, id: Long): Unit = {
    if (n == scores.length) compact()
    // Hot path: a freshly compacted full buffer rejects anything not
    // better than its worst kept entry without appending (so `sorted`
    // stays true and the next rejection is just as cheap).
    if (sorted && n >= k && !better(score, id, scores(n - 1), ids(n - 1))) return
    scores(n) = score; ids(n) = id; n += 1
    sorted = false
  }

  /** Sort by (score desc, id asc) and truncate to k. */
  def compact(): Unit = {
    val idx = (0 until n).sortWith { (a, b) =>
      better(scores(a), ids(a), scores(b), ids(b))
    }
    val m = math.min(n, k)
    val ns = new Array[Double](2 * k); val ni = new Array[Long](2 * k)
    var j = 0
    while (j < m) { ns(j) = scores(idx(j)); ni(j) = ids(idx(j)); j += 1 }
    scores = ns; ids = ni; n = m
    sorted = true
  }

  def merge(other: TopKBuffer): Unit = {
    var j = 0
    while (j < other.n) { add(other.scores(j), other.ids(j)); j += 1 }
  }
}

/** Bounded top-k aggregate: keeps the k best (score, id) pairs per
  * group ordered by (score DESC, id ASC), with map-side partial
  * aggregation — each task ships at most k pairs per group to the
  * shuffle, so ranking N scored rows per query costs a shuffle of
  * O(k × partitions) tiny rows instead of the O(N) full-shuffle a
  * `Window.partitionBy(qid)` plan needs.
  *
  * This is the scale fix for batch kNN ranking: with 10 query ids a
  * window plan funnels every scored corpus row onto ≤10 reducers
  * (catastrophic at 100 TB); this aggregate reduces partition-locally
  * first, exactly like TakeOrderedAndProject does for the global
  * top-k queries. (Reference semantics: db/init.sql:162-254 ORDER BY
  * distance LIMIT k, applied per query of a batch.)
  *
  * Output: array<struct<id:long, score:double>> sorted by the
  * ranking order, ready for posexplode → (id, score, rank).
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "top-k aggregate needs k > 0")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))))

  // The SQL surface (top_k_by_score via GraftExtensions) exposes this
  // to arbitrary columns — fail misuse at analysis time, not with a
  // runtime ClassCastException in update().
  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score expects (double, bigint), got " +
          s"(${s.catalogString}, ${i.catalogString})")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    buf.compact()
    val out = new Array[Any](buf.n)
    var j = 0
    while (j < buf.n) {
      out(j) = InternalRow(buf.ids(j), buf.scores(j)); j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    buf.compact()
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var j = 0
    while (j < buf.n) { bb.putDouble(buf.scores(j)); bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt()
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < m) { buf.add(bb.getDouble(), bb.getLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))

  override def prettyName: String = "top_k_by_score"
}

object TopKByScore {
  /** Column-facing aggregate: `topK($"sim", $"vec_id", 5)` →
    * array<struct<id,score>> of the k best rows per group. */
  def apply(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKByScore(GraftBridge.expression(score),
        GraftBridge.expression(id), k).toAggregateExpression())
}
