package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-by-traceId storage layout — the getTrace point-lookup scale
  * path (SURVEY.md §4). The reference serves getTrace from Cassandra
  * keyed by traceId (backends/cassandra); the Spark-native equivalent is
  * a bucketed table: a trace lives in exactly one bucket's files, and
  * every per-trace operator (assembly, transforms, index docs) runs
  * WITHOUT a shuffle because the bucketing already provides the hash
  * distribution.
  *
  * At 100 TB: buckets ≈ cluster parallelism × small factor; trace fetch
  * reads 1/buckets of the data (plus row-group pushdown inside the
  * bucket), and trace-keyed joins between two bucketed relations (e.g.
  * spans ⋈ trace-metadata) are exchange-free.
  */
object BucketedLayout {

  def writeBucketed(spans: DataFrame, table: String, buckets: Int): Unit = {
    val spark = spans.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a table dropped from the catalog can leave an orphaned managed
    // location behind (e.g. across JVM restarts with the default
    // in-memory catalog) — clear it or the CTAS refuses to run. The
    // Hadoop FileSystem API resolves the warehouse URI's scheme, so
    // object-store warehouses (s3a://, hdfs://) clean up like file:/
    // ones — java.io.File would silently no-op on them and strand the
    // CTAS (same pattern as TimePartitioner.expire)
    val warehouse = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(warehouse, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    spans.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, "trace_id")
      .sortBy("trace_id")
      .saveAsTable(table)
  }

  /** Per-trace aggregation over the bucketed table — planner sees the
    * bucket distribution and elides the exchange. */
  def traceSummaries(spark: SparkSession, table: String): DataFrame =
    spark.table(table).groupBy("trace_id")
      .agg(count(lit(1)).as("span_count"), min("start_us").as("trace_start_us"))

  def getTrace(spark: SparkSession, table: String, traceId: String): DataFrame =
    spark.table(table).filter(col("trace_id") === traceId)
}
