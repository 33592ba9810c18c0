package graft

import graft.model.Span
import graft.streaming.SpanBufferStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class IndexDocsStreamSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private def span(trace: String, id: String, tUs: Long, service: String, dur: Long = 10L): Span =
    Span(trace, id, "", service, "op", tUs, dur, "", Map.empty)

  describe("streaming index docs") {
    it("emits windowed (service, operation) rollups once the watermark closes the window") {
      val s = spark
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val t0 = 1704067200000000L
      val input = MemoryStream[Span]
      val out = SpanBufferStream.indexDocsStream(input.toDS(), windowSeconds = 60, gapSeconds = 30)
      val sink = s"idx_docs_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        input.addData(Seq(
          span("t1", "a", t0, "svcA", dur = 5),
          span("t1", "b", t0 + 1000000L, "svcA", dur = 7),
          span("t2", "c", t0 + 2000000L, "svcB")))
        q.processAllAvailable()
        // advance watermark far past the first window
        input.addData(Seq(span("t3", "z", t0 + 600000000L, "svcA")))
        q.processAllAvailable()
      } finally q.stop()
      val rows = s.table(sink).collect()
      val svcA = rows.find(_.getAs[String]("service") == "svcA").get
      svcA.getAs[Long]("span_count") shouldBe 2L
      svcA.getAs[Long]("min_start_us") shouldBe t0
      svcA.getAs[Long]("approx_distinct_durations") shouldBe 2L
      rows.find(_.getAs[String]("service") == "svcB").get.getAs[Long]("span_count") shouldBe 1L
    }
  }

  describe("streaming latency quantiles") {
    it("emits per-(window, service) percentile sketches after watermark close") {
      val s = spark
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val t0 = 1704067200000000L
      val input = MemoryStream[Span]
      val out = SpanBufferStream.latencyQuantilesStream(
        input.toDS(), windowSeconds = 60, gapSeconds = 30)
      val sink = s"lat_q_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        input.addData((1 to 100).map(i =>
          span("t1", s"s$i", t0 + i * 1000L, "svcA", dur = i.toLong)))
        q.processAllAvailable()
        input.addData(Seq(span("t2", "z", t0 + 600000000L, "svcA")))
        q.processAllAvailable()
      } finally q.stop()
      val rows = s.table(sink).collect()
      val svcA = rows.find(_.getAs[String]("service") == "svcA").get
      svcA.getAs[Long]("n_spans") shouldBe 100L
      // 1..100 durations: the t-digest medians land on the exact ranks
      // at this tiny accuracy setting
      svcA.getAs[Long]("p50") shouldBe 50L +- 2L
      svcA.getAs[Long]("p95") shouldBe 95L +- 2L
      svcA.getAs[Long]("p99") shouldBe 99L +- 2L
    }
  }
}
