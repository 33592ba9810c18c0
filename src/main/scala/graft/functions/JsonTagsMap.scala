package graft.functions

import com.fasterxml.jackson.core.JsonFactory
import com.fasterxml.jackson.core.JsonToken

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass tag-JSON parser as a codegen'd Catalyst expression:
  * `json_tags_map(tags)` → `map<string,string>` with LOWERCASED keys,
  * first value per key winning.
  *
  * Exists because the whitelist-extraction semantics (reference
  * lowercases tag keys before its whitelist lookup; duplicate keys
  * differing only in case are legal input) don't fit the built-ins:
  * `transform_keys(lower)` throws DUPLICATED_MAP_KEY, and
  * lambda-based folds/filters are CodegenFallback expressions that
  * re-evaluate the JSON parse per consuming column. This expression
  * is deterministic and codegen-friendly, so whole-stage codegen's
  * subexpression elimination evaluates it ONCE per row no matter how
  * many whitelist fields read from it.
  *
  * Scalar values surface as their JSON text (what the downstream
  * try_cast wants); nested objects/arrays surface as their raw JSON
  * snippet. Malformed JSON → null, like from_json.
  */
case class JsonTagsMap(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MapType(StringType, StringType, valueContainsNull = true)
  override def prettyName: String = "json_tags_map"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    JsonTagsMap.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.JsonTagsMap.parse($c);
      |if (${ev.value} == null) {
      |  ${ev.isNull} = true;
      |}""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): JsonTagsMap =
    copy(child = newChild)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"json_tags_map requires a string argument, got ${child.dataType.catalogString}")
}

object JsonTagsMap {

  private val factory = new JsonFactory()

  /** Flat-object parse: lowered keys (Locale.ROOT — matching Spark's
    * locale-independent lower()), first-wins, scalars as text, nested
    * values as raw JSON text. Returns null on malformed input —
    * including truncated objects and trailing garbage — or non-object
    * roots, like from_json. Parses the UTF-8 bytes directly (no
    * per-row String decode on the hot path). */
  def parse(json: UTF8String): ArrayBasedMapData = {
    try {
      val parser = factory.createParser(json.getBytes)
      try {
        if (parser.nextToken() != JsonToken.START_OBJECT) return null
        val keys = new java.util.ArrayList[UTF8String]()
        val values = new java.util.ArrayList[UTF8String]()
        val seen = new java.util.HashSet[String]()
        var tok = parser.nextToken()
        while (tok == JsonToken.FIELD_NAME) {
          val key = parser.currentName().toLowerCase(java.util.Locale.ROOT)
          val t = parser.nextToken()
          val value: String = t match {
            case JsonToken.VALUE_NULL => null
            case JsonToken.START_OBJECT | JsonToken.START_ARRAY =>
              // capture the nested snippet verbatim
              val sw = new java.io.StringWriter()
              val gen = factory.createGenerator(sw)
              gen.copyCurrentStructure(parser)
              gen.close()
              sw.toString
            case null => return null // truncated mid-value
            case _ => parser.getText
          }
          if (seen.add(key)) {
            keys.add(UTF8String.fromString(key))
            values.add(if (value == null) null else UTF8String.fromString(value))
          }
          tok = parser.nextToken()
        }
        // the object must close AND the input must end there — a
        // truncated object or trailing garbage is malformed, not a
        // partial result to silently index
        if (tok != JsonToken.END_OBJECT || parser.nextToken() != null) return null
        ArrayBasedMapData(keys.toArray, values.toArray)
      } finally parser.close()
    } catch {
      case _: Exception => null
    }
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[JsonTagsMap].getName, null, "json_tags_map",
    "_FUNC_(json) - parse a flat JSON object into map<string,string> " +
      "with lowercased keys, first value per key winning.", "")
}
