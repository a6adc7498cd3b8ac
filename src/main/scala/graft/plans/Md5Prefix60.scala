package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit base hash of a string: the value of the first 15 hex chars
  * of md5 — i.e. the digest's first 60 bits — read straight from the
  * digest bytes. Identical by construction to
  * `conv(substring(md5(x), 1, 15), 16, 10) cast long` (15 hex chars =
  * bytes 0..6 plus the high nibble of byte 7), without materializing
  * the hex string or parsing it back; this sits under every MinHash
  * signature build (one call per feature occurrence).
  */
case class Md5Prefix60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.Md5Prefix60Expr.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60Expr =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix60"
}

object Md5Prefix60Expr {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    prefix60(d)
  }

  /** The thread's digest instance, for callers hashing many ranges
    * in a row ([[TokenKernelsUtil.spanHashes]]) — one ThreadLocal
    * lookup per ROW instead of per span. */
  def ranged(): MessageDigest = digest.get()

  /** [[compute]] over a byte RANGE — no per-call slice copy. */
  def computeRange(md: MessageDigest, b: Array[Byte], from: Int,
      len: Int): Long = {
    md.reset()
    md.update(b, from, len)
    prefix60(md.digest())
  }

  private def prefix60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >>> 4) & 0xfL)
  }

  def apply(c: Column): Column =
    GraftBridge.column(Md5Prefix60Expr(GraftBridge.expression(c)))
}
