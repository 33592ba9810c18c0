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

    it("intervalOverlap equals the naive theta join without duplicates") {
      val weekUs = 7L * 86400000000L
      val o = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("w_start"))
        .withColumn("w_end", col("w_start") + weekUs)
      val a = o.select(col("o_custkey"), col("o_orderkey").as("o1"),
        col("w_start").as("s1"), col("w_end").as("e1"))
      val b = o.select(col("o_custkey"), col("o_orderkey").as("o2"),
        col("w_start").as("s2"), col("w_end").as("e2"))
      // deliberately NOT the interval width: uneven binning exercises the
      // match-once bucket rule across multi-bucket overlaps
      val binned = RangeJoin.intervalOverlap(
        a, b, "s1", "e1", "s2", "e2", Seq("o_custkey"), width = 3L * 86400000000L)
        .filter(col("o1") < col("o2"))
        .select("o1", "o2").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val naive = a.join(b, a("o_custkey") === b("o_custkey") &&
          col("o1") < col("o2") && col("s1") < col("e2") && col("s2") < col("e1"))
        .select("o1", "o2").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      binned should not be empty
      binned.distinct.size shouldBe binned.size // match-once rule: no dup pairs
      binned.toSet shouldBe naive.toSet
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
