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

  def traceStore(spark: SparkSession, layout: StoreLayout): DataFrame =
    spark.table(layout.bucketTable)

  def indexStore(spark: SparkSession, layout: StoreLayout): DataFrame =
    spark.read.parquet(layout.indexDir)

  def serviceCatalog(spark: SparkSession, layout: StoreLayout): DataFrame =
    spark.read.parquet(layout.metaDir)
}
