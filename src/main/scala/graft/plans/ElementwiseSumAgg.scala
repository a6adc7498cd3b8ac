package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise sum of fixed-length int-array rows into one long
  * array per group — the bounded-state building block for signature
  * aggregation (SimHash bit-vote tallies).
  *
  * Scale design: state is exactly `len` longs per group regardless of
  * input size, and partial aggregation is a map-side elementwise add —
  * so a SimHash signature build is ONE narrow shuffle of (doc_id,
  * long[len]) rows. The alternative (exploding tokens × len bit
  * positions) amplifies the token relation len× through two shuffles,
  * which round 1 was flagged for.
  */
case class ElementwiseSum(
    child: Expression,
    len: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(len > 0, "elementwise_sum needs len > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Fail non-int-array input at analysis time (getInt on an
  // array<bigint> would silently read garbage bytes at execution).
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"elementwise_sum expects array<int>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(len, arr.numElements())
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) buf(j) += arr.getInt(j)
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < len) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * len)
    var j = 0
    while (j < len) { bb.putLong(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](len)
    var j = 0
    while (j < len) { buf(j) = bb.getLong(); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ElementwiseSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ElementwiseSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ElementwiseSum =
    copy(child = newChildren(0))

  override def prettyName: String = "elementwise_sum"
}

object ElementwiseSum {
  /** Column-facing aggregate: sums `array<int>` rows elementwise into
    * one `array<long>` of length `len` per group. */
  def apply(arr: Column, len: Int): Column =
    GraftBridge.column(
      ElementwiseSum(GraftBridge.expression(arr), len).toAggregateExpression())
}
