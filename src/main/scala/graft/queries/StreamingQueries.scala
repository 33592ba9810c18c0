package graft.queries

import graft.Tables
import graft.streaming.SpanBufferStream
import graft.trace.TraceDataset
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming coverage (SURVEY.md §2 A3): the indexer's accumulate-and-
  * seal loop as a real Structured Streaming job over the events parquet,
  * run to completion with an AvailableNow trigger and returned as the
  * sealed-buffer summary. Rows-only check (watermark semantics are not
  * DuckDB-expressible); exact sealing behavior is specified in
  * SpanBufferStreamSpec.
  */
object StreamingQueries {

  private def run(s: SparkSession, dir: String): DataFrame = {
    // batch read defines the schema (and flips the nanosAsLong conf the
    // streaming read needs for the TIMESTAMP(NANOS) column)
    val batchSchema = Tables.events(s, dir).schema
    // the file stream source wants a directory: stream the testdata dir
    // with a glob pinned to the events file
    val eventsStream = s.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)

    // at ingest time parents are unknown (the reference's indexer also
    // sees bare spans) — no lag window here, streams can't sort history
    val spanStream = TraceDataset.toSpanDataset(eventsStream.select(
      col("user_id").cast("string").as("trace_id"),
      col("event_id").as("span_id"),
      lit(null).cast("long").as("parent_span_id"),
      col("event_type").as("service"),
      concat(lit("op_"), (get_json_object(col("props"), "$.k").cast("int") % 5).cast("string"))
        .as("operation"),
      expr("ts div 1000").as("start_us"),
      round(col("value") * 1000, 0).cast("long").as("duration_us"),
      lit("").as("kind"),
      col("props").as("tags")))

    // state-store init cost scales with state partitions; a bounded
    // one-file backlog doesn't need the full batch parallelism
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val sealedBuffers = SpanBufferStream.assemble(spanStream, gapSeconds = 60, maxSpans = 10000)
    val sink = s"sealed_buffers_${System.nanoTime()}"
    val q = sealedBuffers
      .select(col("traceId").as("trace_id"), size(col("spans")).cast("long").as("span_count"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination()
    finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    drainSink(s, sink).orderBy("trace_id")
  }

  /** Copy a (small) memory-sink result out and DROP the sink table —
    * leaked sinks accumulate in driver memory across bench/verify
    * runs and slow every later query. */
  private def drainSink(s: SparkSession, sink: String): DataFrame = {
    val out = s.table(sink)
    val materialized = s.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(out.collect(): _*)), out.schema)
    s.catalog.dropTempView(sink)
    materialized
  }

  /** Streaming exact dedup over a doubled backlog (the at-least-once
    * redelivery case): every span arrives twice, the watermarked
    * dropDuplicates must emit each exactly once — checked by comparing
    * the sink count to the batch distinct count downstream (rows-only
    * here; exact semantics in SpanBufferStreamSpec). */
  private def runDedup(s: SparkSession, dir: String): DataFrame = {
    val batchSchema = Tables.events(s, dir).schema
    val eventsStream = s.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val spanStream = TraceDataset.toSpanDataset(eventsStream.select(
      col("user_id").cast("string").as("trace_id"),
      col("event_id").as("span_id"),
      lit(null).cast("long").as("parent_span_id"),
      col("event_type").as("service"),
      lit("op").as("operation"),
      expr("ts div 1000").as("start_us"),
      round(col("value") * 1000, 0).cast("long").as("duration_us"),
      lit("").as("kind"),
      col("props").as("tags")))
    val doubled = spanStream.union(spanStream)
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val sink = s"dedup_spans_${System.nanoTime()}"
    val q = SpanBufferStream.dedupSpans(doubled, gapSeconds = 60)
      .groupBy("service").count()
      .writeStream.format("memory").queryName(sink)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination()
    finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    drainSink(s, sink).orderBy("service")
  }

  val defs: Map[String, QueryDef] = Map(
    "streaming_span_buffer" -> QueryDef.rowsOnly(run),
    "streaming_dedup" -> QueryDef.rowsOnly(runDedup))
}
