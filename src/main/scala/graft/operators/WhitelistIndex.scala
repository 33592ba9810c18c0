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

  /** Lowercase names/aliases (Locale.ROOT — matching the tag-key
    * lowering in json_tags_map), drop disabled, keep first of each
    * name. */
  def normalize(fields: Seq[WhitelistField]): Seq[WhitelistField] = {
    val root = java.util.Locale.ROOT
    val lc = fields.filter(_.enabled).map(f =>
      f.copy(name = f.name.toLowerCase(root), aliases = f.aliases.map(_.toLowerCase(root))))
    lc.groupBy(_.name).map(_._2.head).toSeq.sortBy(_.name)
  }

  /** spans + one typed column per enabled whitelist field. The tags
    * JSON is parsed by the native codegen'd
    * [[graft.functions.JsonTagsMap]] expression — lowercased keys,
    * first value per key (the reference lowercases tag keys before its
    * whitelist lookup; duplicate keys differing only in case are legal
    * input, where `transform_keys(lower)` would throw
    * DUPLICATED_MAP_KEY). Being a plain deterministic expression, WSCG
    * subexpression elimination evaluates the parse ONCE per row no
    * matter how many fields read from it — lambda-based folds/filters
    * are CodegenFallback and re-parse per consuming column, and their
    * duplicated trees cost seconds of optimizer time. Each lookup is
    * then a codegen'd map element_at; the cast is `try_cast`: a
    * non-convertible value indexes as null (reference ignores it)
    * instead of failing the job. */
  def extractTags(spans: DataFrame, fields: Seq[WhitelistField]): DataFrame = {
    graft.GraftExtensions.register(spans.sparkSession)
    val fs = normalize(fields)
    // a whitelist field whose lowercased name equals an existing span
    // column would silently append a DUPLICATE column name, making every
    // downstream reference ambiguous — fail at definition time instead
    val clash = fs.map(_.name).toSet
      .intersect(spans.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet)
    require(clash.isEmpty,
      s"whitelist field name(s) ${clash.toSeq.sorted.mkString(", ")} collide with span columns; " +
        "rename the whitelist field (the span column already serves those queries)")
    val tagsMap = expr("json_tags_map(`tags`)")
    // try_element_at: ANSI element_at throws on a missing map key
    def lookup(key: String): Column = try_element_at(tagsMap, lit(key))
    val withRaw = fs.foldLeft(spans)((df, f) =>
      df.withColumn(s"__raw_${f.name}",
        coalesce((f.name +: f.aliases).map(lookup): _*)))
    withRaw.selectExpr(
      spans.columns.map(c => s"`$c`") ++
        fs.map(f => s"try_cast(`__raw_${f.name}` AS ${f.fieldType}) AS `${f.name}`"): _*)
  }

  /** getFieldNames: intrinsic doc fields ∪ whitelisted fields with at
    * least one successfully indexed value in `spans`. One aggregate
    * over the extracted columns (a single 1-row partial-agg pass), then
    * a literal union — no second scan. */
  def fieldNames(spans: DataFrame, fields: Seq[WhitelistField]): DataFrame = {
    val fs = normalize(fields)
    if (fs.isEmpty) {
      // no (enabled) whitelist fields: the catalog is just the
      // intrinsic doc fields, like the reference with an empty config
      val s = spans.sparkSession
      import s.implicits._
      return IntrinsicFields.toDF("field").distinct()
    }
    // presence flags are INTS, not strings: a string max buffer forces
    // SortAggregate (full sort of every span); an int buffer keeps the
    // one-row presence pass in HashAggregate
    val present = fs.map(f =>
      max(when(col(f.name).isNotNull, lit(1)).otherwise(lit(0))).as(f.name))
    extractTags(spans, fields)
      .agg(present.head, present.tail: _*)
      .select(explode(concat(
        array(IntrinsicFields.map(lit): _*),
        array(fs.map(f => when(col(f.name) === 1, lit(f.name))): _*))).as("field"))
      .filter(col("field").isNotNull)
      .distinct()
  }

  /** Config-side catalog with metadata (name, type, range-query flag) —
    * the FieldMetadata the reference attaches to each name. */
  def catalog(fields: Seq[WhitelistField]): Seq[(String, String, Boolean)] =
    normalize(fields).map(f => (f.name, f.fieldType, f.enableRangeQuery))

  /** JSON-lines whitelist config → fields (one object per line:
    * `{"name":…,"fieldType":…,"aliases":[…],"enableRangeQuery":…,
    * "enabled":…}`; only `name` is required). Read through Spark's own
    * JSON source so the wire shape matches the rest of the engine —
    * the file is driver-tiny (#fields rows). */
  def loadConfig(spark: org.apache.spark.sql.SparkSession, path: String): Seq[WhitelistField] = {
    val schema = "name string, fieldType string, aliases array<string>, " +
      "enableRangeQuery boolean, enabled boolean"
    spark.read.schema(schema).json(path).collect().toSeq.map { r =>
      require(!r.isNullAt(0), s"whitelist config $path: every field needs a name")
      WhitelistField(
        name = r.getString(0),
        fieldType = if (r.isNullAt(1)) "string" else r.getString(1),
        aliases = if (r.isNullAt(2)) Nil else r.getSeq[String](2),
        enableRangeQuery = !r.isNullAt(3) && r.getBoolean(3),
        enabled = r.isNullAt(4) || r.getBoolean(4))
    }
  }

  /** Hot-reload loop (reference commons/config/reload/
    * ConfigurationReloadElasticSearchProvider.scala:1 polling
    * WhitelistIndexFieldConfiguration.scala into the live indexer):
    * the Spark-native shape keeps PLAN-TIME config binding — no
    * live-plan mutation — and re-reads the config between batches: a
    * long-running driver calls [[Reloader.current]] before planning
    * each batch, and a changed file takes effect on that next batch.
    * Change detection is (mtime, length) so an unchanged file costs
    * one FileSystem stat, not a read. */
  final class Reloader(spark: org.apache.spark.sql.SparkSession, path: String) {
    @volatile private var cachedKey: (Long, Long) = (Long.MinValue, Long.MinValue)
    @volatile private var cachedFields: Seq[WhitelistField] = Nil
    def current(): Seq[WhitelistField] = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(p)
      val key = (st.getModificationTime, st.getLen)
      if (key != cachedKey) {
        cachedFields = loadConfig(spark, path)
        cachedKey = key
      }
      cachedFields
    }
  }
}
