package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class RangeJoinSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("w_id", "span_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def spansWindows() = {
    val sp = graft.operators.SpanOps.spansFromEvents(Tables.events(spark, sfDir))
      .select("span_id", "service", "start_us")
    val windows = sp.filter(col("span_id") % 37 === 0)
      .select(col("span_id").as("w_id"), col("service"),
        col("start_us").as("w_start"), (col("start_us") + lit(7200000000L)).as("w_end"))
    (sp, windows)
  }

  describe("RangeJoin.pointInInterval") {
    it("produces exactly the naive theta-join pair set on real data") {
      val (sp, windows) = spansWindows()
      val binned = pairs(RangeJoin.pointInInterval(
        sp, windows, "start_us", "w_start", "w_end", Seq("service"), width = 3600000000L))
      val naive = pairs(sp.join(windows,
        sp("service") === windows("service") &&
          sp("start_us") >= windows("w_start") && sp("start_us") < windows("w_end")))
      binned should not be empty
      binned shouldBe naive
    }

    it("is width-invariant (bucketing is internal, results are not)") {
      val (sp, windows) = spansWindows()
      val at1h = pairs(RangeJoin.pointInInterval(
        sp, windows, "start_us", "w_start", "w_end", Seq("service"), width = 3600000000L))
      // width far below and far above the interval length
      for (w <- Seq(600000000L, 86400000000L)) {
        pairs(RangeJoin.pointInInterval(
          sp, windows, "start_us", "w_start", "w_end", Seq("service"), width = w)) shouldBe at1h
      }
    }

    it("honors half-open [start, end) edges and drops inverted intervals") {
      val s = spark
      import s.implicits._
      val points = Seq((1L, "a", 100L), (2L, "a", 199L), (3L, "a", 200L), (4L, "b", 150L))
        .toDF("span_id", "service", "start_us")
      val intervals = Seq((10L, "a", 100L, 200L), (11L, "b", 300L, 300L), (12L, "b", 400L, 100L))
        .toDF("w_id", "service", "w_start", "w_end")
      pairs(RangeJoin.pointInInterval(
        points, intervals, "start_us", "w_start", "w_end", Seq("service"), width = 50L)) shouldBe
        Set((10L, 1L), (10L, 2L)) // 200 excluded (half-open), b-intervals empty/inverted
    }

    it("plans as an equi-join, never a nested-loop/cartesian compare") {
      val (sp, windows) = spansWindows()
      val plan = RangeJoin.pointInInterval(
        sp, windows, "start_us", "w_start", "w_end", Seq("service"), width = 3600000000L)
        .queryExecution.executedPlan.toString
      plan should not include "NestedLoop"
      plan should not include "Cartesian"
      assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin")
        || plan.contains("ShuffledHashJoin"), s"no hash/merge join in plan:\n$plan")
    }
  }
}
