package graft.trace

import graft.model.{Span, SpanBuffer}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed wrappers around the per-trace logic in
  * [[TraceTransforms]].
  *
  * Scale shape: ONE hash shuffle on traceId co-locates each trace, then
  * all pipeline steps run partition-local. Trace sizes are bounded (the
  * reference caps buffered spans per trace), so per-group memory is
  * bounded and the operator scales linearly with executor count.
  */
object TraceDataset {

  /** Columnar span relation → typed Dataset[Span]. */
  def toSpanDataset(spans: DataFrame): Dataset[Span] = {
    val s = spans.sparkSession
    import s.implicits._
    spans.select(
      col("trace_id").as("traceId"),
      col("span_id").cast("string").as("spanId"),
      coalesce(col("parent_span_id").cast("string"), lit("")).as("parentSpanId"),
      col("service"),
      col("operation"),
      col("start_us").as("startUs"),
      col("duration_us").as("durationUs"),
      coalesce(col("kind"), lit("")).as("kind"),
      coalesce(from_json(col("tags").cast("string"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)),
        map().cast("map<string,string>")).as("tags")
    ).as[Span]
  }

  /** Group spans into sealed trace buffers — the batch analogue of the
    * reference indexer's SpanBufferMemoryStore accumulation. */
  def assemble(spans: Dataset[Span]): Dataset[SpanBuffer] = {
    val s = spans.sparkSession
    import s.implicits._
    spans.groupByKey(_.traceId).mapGroups((id, it) => SpanBuffer(id, it.toSeq))
  }

  /** Apply a per-trace pipeline after a single traceId shuffle. */
  def transformTraces(spans: Dataset[Span])(pipeline: Seq[Span] => Seq[Span]): Dataset[Span] = {
    val s = spans.sparkSession
    import s.implicits._
    spans.groupByKey(_.traceId).flatMapGroups((_, it) => pipeline(it.toSeq))
  }

  /** Reference default read path: raw spans → processed traces. */
  def processedSpans(spans: Dataset[Span]): Dataset[Span] =
    transformTraces(spans)(TraceTransforms.defaultPipeline)

  /** Per-trace validation report (TraceValidationHandler). */
  def validateTraces(spans: Dataset[Span]): Dataset[TraceTransforms.TraceValidation] = {
    val s = spans.sparkSession
    import s.implicits._
    spans.groupByKey(_.traceId).mapGroups((id, it) => TraceTransforms.validate(id, it.toSeq))
  }

  /** Call-graph edges across all traces (TraceReader.getTraceCallGraph,
    * lifted from one-trace-per-rpc to a whole-corpus operator). */
  def callGraphEdges(spans: Dataset[Span]): DataFrame = {
    val s = spans.sparkSession
    import s.implicits._
    spans.groupByKey(_.traceId)
      .flatMapGroups((_, it) => TraceTransforms.callGraph(TraceTransforms.defaultPipeline(it.toSeq)))
      .groupBy("fromService", "fromOperation", "toService", "toOperation")
      // -1 is the "no measurable delta" sentinel (server span not shorter
      // than client) — keep it out of the aggregate. Exact BIGINT sum +
      // count (avg = sum/n for callers): integer outputs hash
      // deterministically where a double average cannot
      .agg(count(lit(1)).as("n_calls"),
        sum(when(col("networkDeltaUs") >= 0, col("networkDeltaUs"))).as("sum_network_delta_us"),
        count(when(col("networkDeltaUs") >= 0, lit(1))).as("n_measured"))
  }
}
