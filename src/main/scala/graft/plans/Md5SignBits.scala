package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ±1 SimHash contribution vector from a token: element p =
  * (ascii(hex(md5(token))[p]) % 2) * 2 - 1, computed straight from
  * the digest bytes in one call — no hex string, no char array, no
  * interpreted transform. Replaces `split(md5(tok), "")` +
  * `transform(ascii…)` on the signature-build hot path (~1M tokens
  * per pass); semantics are bit-identical (asserted in LshSpec).
  *
  * Parity note: lowercase hex digits are '0'..'9' (even ascii base)
  * and 'a'..'f' (odd base), so the ascii parity of nibble v is
  * `v & 1` for v < 10 and `(v + 1) & 1` otherwise.
  */
case class Md5SignBitsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_sign_bits expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5SignBitsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.Md5SignBitsExpr.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Md5SignBitsExpr =
    copy(child = newChild)

  override def prettyName: String = "md5_sign_bits"
}

object Md5SignBitsExpr {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and generated code (identical paths
    * by construction). */
  def compute(s: UTF8String): GenericArrayData = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Int](32)
    var i = 0
    while (i < 16) {
      val hi = (d(i) >>> 4) & 0xf
      val lo = d(i) & 0xf
      out(2 * i) = ((if (hi < 10) hi else hi + 1) & 1) * 2 - 1
      out(2 * i + 1) = ((if (lo < 10) lo else lo + 1) & 1) * 2 - 1
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column =
    GraftBridge.column(Md5SignBitsExpr(GraftBridge.expression(c)))
}
