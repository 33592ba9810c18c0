package graft.trace

import graft.operators.{BucketedLayout, SpanOps, TimePartitioner}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Unified write path — what the reference indexer fans out to its three
  * sinks (Cassandra trace blobs via GrpcTraceWriter/backends, ES index
  * docs via ElasticSearchWriter, service metadata via
  * ServiceMetadataWriter), re-expressed as three Spark-native layouts
  * from ONE pass over the span relation:
  *
  *  - trace store  → bucketed-by-traceId table (point lookups, and all
  *    per-trace operators run exchange-free on top)
  *  - index store  → dt(/hr) partitioned index docs (time-pruned search)
  *  - service meta → small catalog relation (always broadcastable)
  */
object TraceStoreWriter {

  final case class StoreLayout(
      bucketTable: String = "graft_spans",
      buckets: Int = 64,
      indexDir: String,
      metaDir: String,
      hourly: Boolean = true)

  def writeAll(spans: DataFrame, layout: StoreLayout): Unit = {
    BucketedLayout.writeBucketed(spans, layout.bucketTable, layout.buckets)
    val spark = spans.sparkSession
    val stored = spark.table(layout.bucketTable)
    TimePartitioner.writePartitioned(
      SpanOps.indexDocs(stored)
        .join(stored.groupBy("trace_id").agg(
          org.apache.spark.sql.functions.min("start_us").as("start_us")), "trace_id"),
      layout.indexDir, layout.hourly)
    SpanOps.serviceMetadata(stored).write.mode("overwrite").parquet(layout.metaDir)
  }

  /** The STREAMING form of the fan-out — the reference indexer's
    * actual topology: one Kafka consumer loop that, per poll batch,
    * writes sealed buffers to Cassandra AND index docs to ES AND
    * service metadata (indexer `SpanIndexProcessor.process` calls all
    * writers on each batch). Here: sealed [[graft.model.SpanBuffer]]s
    * land per MICRO-batch via foreachBatch into three append sinks
    * under `baseDir` — `spans/` (the trace store rows), `index/`
    * (per-trace index docs), `meta/` (service/operation sightings,
    * deduplicated at read). The batch is persisted once so the three
    * writes share one computation of the sealed set, mirroring
    * [[writeAll]]'s one-pass contract; everything stays on executors
    * (parquet file sinks, no driver collect).
    *
    * Exactly-once caveat, stated honestly: foreachBatch is
    * at-least-once on retry (the reference's writers are too —
    * Cassandra upserts make it idempotent there; a real deployment
    * would key files by batchId the same way). Returns after the
    * AvailableNow replay completes. */
  def writeAllStream(
      buffers: org.apache.spark.sql.Dataset[graft.model.SpanBuffer],
      baseDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val q = buffers.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.model.SpanBuffer], _: Long) =>
        val b = batch.persist()
        try {
          val spans = b.select(explode(col("spans")).as("s")).select("s.*")
          spans.write.mode("append").parquet(s"$baseDir/spans")
          b.select(col("traceId").as("trace_id"),
            size(col("spans")).cast("long").as("span_count"),
            expr("array_min(transform(spans, x -> x.startUs))").as("start_us"))
            .write.mode("append").parquet(s"$baseDir/index")
          spans.select("service", "operation").distinct()
            .write.mode("append").parquet(s"$baseDir/meta")
        } finally { b.unpersist(); () }
      }
      .option("checkpointLocation", s"$baseDir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  def traceStore(spark: SparkSession, layout: StoreLayout): DataFrame =
    spark.table(layout.bucketTable)

  def indexStore(spark: SparkSession, layout: StoreLayout): DataFrame =
    spark.read.parquet(layout.indexDir)

  def serviceCatalog(spark: SparkSession, layout: StoreLayout): DataFrame =
    spark.read.parquet(layout.metaDir)
}
