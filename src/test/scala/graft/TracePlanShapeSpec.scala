package graft

import graft.operators.SpanOps
import graft.trace.TraceDataset
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Regression guard for the SURVEY §4 scale claim: the whole per-trace
  * pipeline costs ONE shuffle beyond the span derivation — every
  * transformer/validator runs partition-local after the traceId hash
  * exchange, never a shuffle per step. */
class TracePlanShapeSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private def exchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length

  private lazy val spanDs = TraceDataset.toSpanDataset(
    SpanOps.spansFromEvents(Tables.events(spark, sfDir))
      .withColumn("kind", org.apache.spark.sql.functions.lit("")))

  describe("per-trace pipeline plan shape") {
    it("processedSpans adds exactly one exchange beyond the span derivation") {
      val base = exchanges(spanDs.queryExecution.executedPlan.toString)
      val processed = exchanges(
        TraceDataset.processedSpans(spanDs).queryExecution.executedPlan.toString)
      processed shouldBe base + 1
    }

    it("validateTraces adds exactly one exchange") {
      val base = exchanges(spanDs.queryExecution.executedPlan.toString)
      val validated = exchanges(
        TraceDataset.validateTraces(spanDs).queryExecution.executedPlan.toString)
      validated shouldBe base + 1
    }

    it("assemble adds exactly one exchange") {
      val base = exchanges(spanDs.queryExecution.executedPlan.toString)
      val assembled = exchanges(
        TraceDataset.assemble(spanDs).queryExecution.executedPlan.toString)
      assembled shouldBe base + 1
    }
  }
}
