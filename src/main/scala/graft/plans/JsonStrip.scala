package graft.plans

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Denylist field-stripping over schema-free JSON — the reference's
  * pre-ingest cleaning stage (reference: cardsCleaning/
  * cleanCardJson.py:3-16 `clean_card_data`, which pops a fixed list
  * of keys from every card object before ingest). Spark has no
  * json_remove/json_merge_patch, and rebuilding via from_json/to_json
  * would need the full schema — the reference's point is that the
  * denylist works on ARBITRARY objects. One Jackson pass per row:
  * parse, drop the top-level denylist keys, re-serialize with the
  * surviving fields in their original order.
  */
object JsonStripUtil {

  // ObjectMapper is thread-safe after configuration; one shared
  // instance per executor JVM.
  private val mapper = new ObjectMapper()

  /** Strip `keys` from the top level of the JSON object in `s`.
    * Non-object JSON (arrays, scalars) passes through unchanged —
    * same as clean_card_data, which only ever pops dict keys.
    * Malformed JSON yields null, matching the lenience of Spark's
    * own get_json_object. */
  def strip(s: UTF8String, keys: Array[String]): UTF8String = {
    try {
      val node = mapper.readTree(s.toString)
      node match {
        case o: ObjectNode =>
          var i = 0
          while (i < keys.length) { o.remove(keys(i)); i += 1 }
          UTF8String.fromString(mapper.writeValueAsString(o))
        case _ => s
      }
    } catch {
      case _: java.io.IOException => null
    }
  }
}

/** Native denylist JSON cleaner: `json_strip_keys(json, keys...)`
  * with the denylist fixed at plan time (it is a constant in every
  * reference use — clean_card_data's fields_to_remove). Stays inside
  * whole-stage codegen via a reference-object call. */
case class JsonStripKeys(child: Expression, keys: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"json_strip_keys expects string json, got ${other.catalogString}")
    }

  private lazy val keyArr: Array[String] = keys.toArray

  override def nullSafeEval(s: Any): Any =
    JsonStripUtil.strip(s.asInstanceOf[UTF8String], keyArr)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stripKeys", keyArr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.JsonStripUtil.strip($c, $ref);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): JsonStripKeys = copy(child = newChild)

  override def prettyName: String = "json_strip_keys"
}

object JsonStripKeys {
  /** Column-facing constructor: `jsonStripKeys($"js", Seq("a","b"))`. */
  def apply(c: Column, keys: Seq[String]): Column =
    GraftBridge.column(JsonStripKeys(GraftBridge.expression(c), keys))
}
