package graft

import org.apache.spark.sql.GraftPlanBridge
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class AsOfJoinSpec extends AnyFunSpec with Matchers with SparkTestBase {

  describe("AsOfJoinExec") {
    it("matches each left row to the latest right row at or before it") {
      val s = spark
      import s.implicits._
      val left = Seq(("k1", 100L), ("k1", 200L), ("k2", 50L)).toDF("k", "t")
      val right = Seq(("k1", 90L), ("k1", 150L), ("k1", 250L), ("k2", 60L)).toDF("k", "t")
      val out = GraftPlanBridge.asofJoin(left, right, Seq("k"), "t")
        .select("k", "t", "t_r").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // k1@100 → 90; k1@200 → 150; k2@50 has no right row at/before → dropped
      out shouldBe Set(("k1", 100L, 90L), ("k1", 200L, 150L))
    }

    it("matches the window-based equivalent on real data") {
      val sp = graft.operators.SpanOps.spansFromEvents(Tables.events(spark, sfDir))
      val errors = sp.filter(col("service") === "error").select("trace_id", "span_id", "start_us")
      val purchases = sp.filter(col("service") === "purchase").select("trace_id", "span_id", "start_us")

      val custom = GraftPlanBridge.asofJoin(errors, purchases, Seq("trace_id"), "start_us")
        .select("span_id", "span_id_r").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

      // declarative equivalent: range join + keep latest per left row
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("span_id").orderBy(col("p_start").desc, col("p_span").desc)
      val expected = errors.join(
        purchases.select(col("trace_id"), col("span_id").as("p_span"), col("start_us").as("p_start")),
        Seq("trace_id"))
        .filter(col("start_us") >= col("p_start"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("span_id", "p_span").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

      custom shouldBe expected
    }

    it("breaks right-side time ties deterministically (total-order max)") {
      val s = spark
      import s.implicits._
      val left = Seq(("k1", 100L)).toDF("k", "t")
      // three right rows tied at t=90: the kept one must be the total-
      // order maximum of the remaining columns ("c"), on every run and
      // under any input partitioning
      val right = Seq(("k1", 90L, "a"), ("k1", 90L, "c"), ("k1", 90L, "b"))
        .toDF("k", "t", "tag").repartition(5)
      (1 to 3).foreach { _ =>
        val out = GraftPlanBridge.asofJoin(left, right, Seq("k"), "t")
          .select("tag_r").collect().map(_.getString(0)).toSeq
        out shouldBe Seq("c")
      }
    }

    it("rejects non-long time columns at analysis time with a clear error") {
      val s = spark
      import s.implicits._
      val left = Seq(("k1", 100)).toDF("k", "t") // Int time
      val right = Seq(("k1", 90)).toDF("k", "t")
      val e = intercept[IllegalArgumentException] {
        GraftPlanBridge.asofJoin(left, right, Seq("k"), "t")
      }
      e.getMessage should include("must be LongType")
    }

    it("produces the exchange/sort shape of a merge join, not a cross product") {
      val sp = graft.operators.SpanOps.spansFromEvents(Tables.events(spark, sfDir))
      val errors = sp.filter(col("service") === "error").select("trace_id", "span_id", "start_us")
      val purchases = sp.filter(col("service") === "purchase").select("trace_id", "span_id", "start_us")
      val plan = GraftPlanBridge.asofJoin(errors, purchases, Seq("trace_id"), "start_us")
        .queryExecution.executedPlan.toString
      plan should include("AsOfJoin")
      plan should not include "CartesianProduct"
      plan should not include "BroadcastNestedLoopJoin"
    }
  }

  describe("AsOfJoinExec nearest direction") {
    it("picks whichever side is closer and prefers backward on exact ties") {
      val s = spark
      import s.implicits._
      // left@100: back 90 (d=10) vs fwd 105 (d=5) → fwd
      // left@200: back 195 (d=5) vs fwd 205 (d=5) → tie → back
      // left@300: only fwd 310 exists → fwd (backward-only would drop it)
      val left = Seq(("k1", 100L), ("k1", 200L), ("k2", 300L)).toDF("k", "t")
      val right = Seq(("k1", 90L), ("k1", 105L), ("k1", 195L), ("k1", 205L),
        ("k2", 310L)).toDF("k", "t")
      val out = GraftPlanBridge.asofJoin(left, right, Seq("k"), "t", nearest = true)
        .select("k", "t", "t_r").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      out shouldBe Set(("k1", 100L, 105L), ("k1", 200L, 195L), ("k2", 300L, 310L))
    }

    it("matches a window-based nearest equivalent on real data") {
      val sp = graft.operators.SpanOps.spansFromEvents(Tables.events(spark, sfDir))
      val errors = sp.filter(col("service") === "error")
        .select("trace_id", "span_id", "start_us")
      val purchases = sp.filter(col("service") === "purchase")
        .select("trace_id", "span_id", "start_us")
      val custom = GraftPlanBridge
        .asofJoin(errors, purchases, Seq("trace_id"), "start_us", nearest = true)
        .select("span_id", "span_id_r").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("span_id")
        .orderBy(col("adiff"), col("dir"),
          when(col("dir") === 0, -col("p_span")).otherwise(col("p_span")))
      val expected = errors.join(
          purchases.select(col("trace_id"), col("span_id").as("p_span"),
            col("start_us").as("p_start")), Seq("trace_id"))
        .withColumn("adiff",
          when(col("p_start") <= col("start_us"), col("start_us") - col("p_start"))
            .otherwise(col("p_start") - col("start_us")))
        .withColumn("dir", when(col("p_start") <= col("start_us"), 0).otherwise(1))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("span_id", "p_span").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      custom shouldBe expected
    }

    it("forward-only left rows appear under nearest but not backward") {
      val s = spark
      import s.implicits._
      val left = Seq(("k1", 10L)).toDF("k", "t")
      val right = Seq(("k1", 20L)).toDF("k", "t")
      GraftPlanBridge.asofJoin(left, right, Seq("k"), "t").count() shouldBe 0L
      GraftPlanBridge.asofJoin(left, right, Seq("k"), "t", nearest = true)
        .count() shouldBe 1L
    }
  }
}
