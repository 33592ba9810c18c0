package graft

import graft.operators.SpanOps
import graft.trace.{TraceStoreWriter, TraceTransforms}
import graft.model.Span
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class TraceStoreWriterSpec extends AnyFunSpec with Matchers with SparkTestBase {

  describe("deriveKinds") {
    it("backfills kind from the span.kind tag only when unset") {
      val a = Span("t", "a", "", "s", "o", 1, 1, "", Map("span.kind" -> "CLIENT"))
      val b = Span("t", "b", "", "s", "o", 1, 1, "server", Map("span.kind" -> "client"))
      val c = Span("t", "c", "", "s", "o", 1, 1, "", Map.empty)
      val out = TraceTransforms.deriveKinds(Seq(a, b, c))
      out.map(_.kind) shouldBe Seq("client", "server", "")
    }
  }

  describe("TraceStoreWriter") {
    it("materializes all three store layouts from one span relation") {
      val tmp = java.nio.file.Files.createTempDirectory("graft_store").toString
      val layout = TraceStoreWriter.StoreLayout(
        bucketTable = "graft_spans_spec", buckets = 8,
        indexDir = s"$tmp/index", metaDir = s"$tmp/meta", hourly = false)
      val spans = SpanOps.spansFromEvents(Tables.events(spark, sfDir))
      TraceStoreWriter.writeAll(spans, layout)

      TraceStoreWriter.traceStore(spark, layout).count() shouldBe spans.count()
      val idx = TraceStoreWriter.indexStore(spark, layout)
      idx.columns should contain allOf ("trace_id", "service", "operation", "span_count", "dt")
      idx.count() should be > 0L
      val meta = TraceStoreWriter.serviceCatalog(spark, layout)
      meta.count() shouldBe spans.select("service").distinct().count()
    }
  }
}
