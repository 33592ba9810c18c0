package graft

import graft.operators.{BucketedLayout, SpanOps}
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class BucketedLayoutSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private lazy val table = {
    BucketedLayout.writeBucketed(
      SpanOps.spansFromEvents(Tables.events(spark, sfDir)), "spans_bucketed", buckets = 8)
    "spans_bucketed"
  }

  describe("bucketed traceId layout") {
    it("serves per-trace aggregation without a shuffle") {
      val plan = BucketedLayout.traceSummaries(spark, table)
        .queryExecution.executedPlan.toString
      // bucketing provides the hash distribution — no Exchange between
      // scan and aggregate
      plan should not include "Exchange"
      plan should include("HashAggregate")
    }

    it("returns the same summaries as the unbucketed path") {
      val bucketed = BucketedLayout.traceSummaries(spark, table)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val plain = SpanOps.spanBufferSummary(
        SpanOps.spansFromEvents(Tables.events(spark, sfDir)))
        .select("trace_id", "span_count", "trace_start_us")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      bucketed shouldBe plain
    }

    it("fetches a single trace") {
      BucketedLayout.getTrace(spark, table, "13").count() should be > 0L
    }

    it("clears an orphaned managed location via the Hadoop FS API (URI-form warehouse)") {
      // the default warehouse is a file: URI — exactly the form a
      // java.io.File cleanup mishandles and an object store generalizes
      val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
      wh.toUri.getScheme shouldBe "file"
      val loc = new org.apache.hadoop.fs.Path(wh, "spans_bucketed_orphan")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // simulate the across-JVM orphan: files at the managed location
      // with no catalog entry (an in-memory catalog forgot the table)
      val stale = new org.apache.hadoop.fs.Path(loc, "stale/part-00000")
      fs.mkdirs(stale.getParent)
      fs.create(stale).close()
      BucketedLayout.writeBucketed(
        SpanOps.spansFromEvents(Tables.events(spark, sfDir)), "spans_bucketed_orphan", buckets = 4)
      fs.exists(stale) shouldBe false
      spark.table("spans_bucketed_orphan").count() should be > 0L
      spark.sql("DROP TABLE spans_bucketed_orphan")
    }
  }
}
