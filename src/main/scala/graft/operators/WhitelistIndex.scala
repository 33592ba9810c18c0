package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Configurable whitelist tag indexing + the field-name catalog served
  * from it — the Spark analogue of the reference's
  * `WhitelistIndexFieldConfiguration` (commons config entity) driving
  * `IndexDocumentGenerator.updateSpanIndexDoc` (indexer, tag→typed
  * index value with per-field type adjustment) and
  * `EsIndexedTraceStore.getFieldNames` (reader, sorted distinct field
  * names).
  *
  * Semantics mirrored from the reference:
  *  - field names and aliases are matched case-insensitively
  *    (config lowercases on load);
  *  - each field may carry aliases — any of (name, aliases) found in
  *    the span's tags JSON feeds the typed column, first hit wins;
  *  - values are adjusted to the field's declared type; values that
  *    fail the conversion are IGNORED (null column), not errors
  *    (`transformValueForIndexing` wraps the cast in Try) — realized
  *    here as `try_cast`, which is also ANSI-mode-safe;
  *  - disabled fields are skipped entirely.
  *
  * The catalog differs from the reference in one deliberate way: ES
  * serves names straight from config, but a Spark store has no ES
  * mapping — so [[fieldNames]] unions the intrinsic index-doc fields
  * (always written by the doc generator) with the whitelisted fields
  * that actually yielded at least one indexable value in the data.
  * A configured field whose tag never appears (or never converts)
  * is absent, exactly like an ES mapping that never materialized.
  */
object WhitelistIndex {

  /** One whitelisted tag field (reference `WhitelistIndexField`). */
  case class WhitelistField(
      name: String,
      fieldType: String, // string | long | int | double | boolean
      aliases: Seq[String] = Nil,
      enableRangeQuery: Boolean = false,
      enabled: Boolean = true)

  /** Fields every index doc carries regardless of config — duration,
    * start time, trace/service/operation keys (TraceIndexDoc constants
    * appended unconditionally in updateSpanIndexDoc). */
  val IntrinsicFields: Seq[String] =
    Seq("duration", "operation", "service", "starttime", "traceid")

  /** Lowercase names/aliases, drop disabled, keep first of each name. */
  def normalize(fields: Seq[WhitelistField]): Seq[WhitelistField] = {
    val lc = fields.filter(_.enabled).map(f =>
      f.copy(name = f.name.toLowerCase, aliases = f.aliases.map(_.toLowerCase)))
    lc.groupBy(_.name).map(_._2.head).toSeq.sortBy(_.name)
  }

  /** Raw (string) tag value for a field: name then aliases, first
    * non-null JSON hit wins. */
  private def rawTag(tags: Column, f: WhitelistField): Column =
    coalesce((f.name +: f.aliases).map(k => get_json_object(tags, s"$$.$k")): _*)

  /** spans + one typed column per enabled whitelist field. The typed
    * cast is `try_cast`: a non-convertible value indexes as null
    * (reference ignores it) instead of failing the job. */
  def extractTags(spans: DataFrame, fields: Seq[WhitelistField]): DataFrame = {
    val fs = normalize(fields)
    val withRaw = fs.foldLeft(spans)((df, f) =>
      df.withColumn(s"__raw_${f.name}", rawTag(col("tags"), f)))
    val typed = withRaw.selectExpr(
      spans.columns.map(c => s"`$c`") ++
        fs.map(f => s"try_cast(`__raw_${f.name}` AS ${f.fieldType}) AS `${f.name}`"): _*)
    typed
  }

  /** getFieldNames: intrinsic doc fields ∪ whitelisted fields with at
    * least one successfully indexed value in `spans`. One aggregate
    * over the extracted columns (a single 1-row partial-agg pass), then
    * a literal union — no second scan. */
  def fieldNames(spans: DataFrame, fields: Seq[WhitelistField]): DataFrame = {
    val fs = normalize(fields)
    val present = fs.map(f => max(when(col(f.name).isNotNull, lit(f.name))).as(f.name))
    extractTags(spans, fields)
      .agg(present.head, present.tail: _*)
      .select(explode(concat(
        array(IntrinsicFields.map(lit): _*),
        array(fs.map(f => col(f.name)): _*))).as("field"))
      .filter(col("field").isNotNull)
      .distinct()
  }

  /** Config-side catalog with metadata (name, type, range-query flag) —
    * the FieldMetadata the reference attaches to each name. */
  def catalog(fields: Seq[WhitelistField]): Seq[(String, String, Boolean)] =
    normalize(fields).map(f => (f.name, f.fieldType, f.enableRangeQuery))
}
