package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded buffer of the k best struct rows under a lexicographic
  * multi-key ordering; at most 2k entries between compactions, so
  * state is O(k × row width) regardless of input size. */
final class TopKRowsBuffer(val k: Int, cmp: (InternalRow, InternalRow) => Int) {
  // Grow geometrically toward the 2k compaction cap instead of
  // eagerly allocating 2k slots — a large-k rank filter must not cost
  // O(k) memory per group before any rows arrive.
  var rows: Array[InternalRow] = new Array[InternalRow](math.min(2 * k, 64))
  var n: Int = 0
  private var sorted = true

  def add(r: InternalRow): Unit = {
    if (n == rows.length && n < 2 * k) {
      rows = java.util.Arrays.copyOf(rows, math.min(2 * k, n * 2))
    }
    if (n == rows.length) compact()
    // Fast reject against the worst kept entry of a sorted full buffer.
    if (sorted && n >= k && cmp(r, rows(n - 1)) >= 0) return
    rows(n) = r
    n += 1
    sorted = false
  }

  def compact(): Unit = {
    java.util.Arrays.sort(rows, 0, n, (a: InternalRow, b: InternalRow) => cmp(a, b))
    n = math.min(n, k)
    sorted = true
  }

  def merge(other: TopKRowsBuffer): Unit = {
    var j = 0
    while (j < other.n) { add(other.rows(j)); j += 1 }
  }
}

/** Generalized bounded top-k-rows aggregate: keeps the k first struct
  * rows per group under the ordering given by `keyIndices` /
  * `ascending` / `nullsFirst` (lexicographic over struct fields),
  * with map-side partial aggregation — the whole-row version of
  * [[TopKByScore]], able to stand in for ANY
  * `row_number() OVER (PARTITION BY … ORDER BY …) <= k` window (the
  * rewrite [[TopKWindowRewrite]] performs exactly that substitution).
  *
  * Scale: a window plan shuffles every input row to its group's
  * reducer and sorts the full group; this aggregate ships at most k
  * rows per group per task. Output: array<struct> in rank order.
  */
case class TopKRows(
    row: Expression,
    keyIndices: Seq[Int],
    ascending: Seq[Boolean],
    nullsFirst: Seq[Boolean],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRowsBuffer] {

  require(k > 0, "top-k needs k > 0")
  require(keyIndices.nonEmpty &&
    keyIndices.length == ascending.length &&
    keyIndices.length == nullsFirst.length, "inconsistent sort spec")

  override def children: Seq[Expression] = Seq(row)
  override def nullable: Boolean = false

  private def structType: StructType =
    row.dataType.asInstanceOf[StructType]

  override def dataType: DataType = ArrayType(structType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = row.dataType match {
    case st: StructType
        if keyIndices.forall(i => i >= 0 && i < st.length) &&
          keyIndices.forall(i =>
            org.apache.spark.sql.catalyst.expressions.RowOrdering
              .isOrderable(st(i).dataType)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_k_rows expects a struct with orderable sort fields, " +
        s"got ${other.catalogString}")
  }

  @transient private lazy val fieldTypes = structType.fields.map(_.dataType)

  @transient private lazy val keyOrderings: Array[Ordering[Any]] =
    keyIndices.map(i =>
      TypeUtils.getInterpretedOrdering(fieldTypes(i))).toArray

  /** Lexicographic compare in RANK order: negative = a ranks first. */
  @transient private lazy val cmp: (InternalRow, InternalRow) => Int =
    (a, b) => {
      var r = 0
      var j = 0
      while (r == 0 && j < keyIndices.length) {
        val i = keyIndices(j)
        val dt = fieldTypes(i)
        val an = a.isNullAt(i)
        val bn = b.isNullAt(i)
        r =
          if (an && bn) 0
          else if (an) { if (nullsFirst(j)) -1 else 1 }
          else if (bn) { if (nullsFirst(j)) 1 else -1 }
          else {
            val c = keyOrderings(j).compare(a.get(i, dt), b.get(i, dt))
            if (ascending(j)) c else -c
          }
        j += 1
      }
      r
    }

  override def createAggregationBuffer(): TopKRowsBuffer =
    new TopKRowsBuffer(k, cmp)

  override def update(buf: TopKRowsBuffer, input: InternalRow): TopKRowsBuffer = {
    val v = row.eval(input)
    if (v != null) buf.add(v.asInstanceOf[InternalRow].copy())
    buf
  }

  override def merge(buf: TopKRowsBuffer, other: TopKRowsBuffer): TopKRowsBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKRowsBuffer): Any = {
    buf.compact()
    val out = new Array[Any](buf.n)
    var j = 0
    while (j < buf.n) { out(j) = buf.rows(j); j += 1 }
    new GenericArrayData(out)
  }

  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def serialize(buf: TopKRowsBuffer): Array[Byte] = {
    buf.compact()
    // .copy() before getBytes: the projection reuses one result
    // buffer, and getBytes returns that backing array uncopied when
    // the row spans it exactly — without the copy every serialized
    // entry aliases the LAST projected row.
    val rows = (0 until buf.n).map(i => toUnsafe(buf.rows(i)).copy().getBytes)
    val total = 4 + rows.map(_.length + 4).sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buf.n)
    rows.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKRowsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKRowsBuffer(k, cmp)
    val n = bb.getInt
    var j = 0
    while (j < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      val r = new UnsafeRow(structType.length)
      r.pointTo(b, len)
      buf.add(r)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(row = newChildren(0))

  override def prettyName: String = "top_k_rows"
}
