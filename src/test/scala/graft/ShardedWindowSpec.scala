package graft

import graft.operators.ShardedWindow
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** The two-phase distributed prefix sum must (a) equal the
  * single-task-per-key window exactly, and (b) actually buy
  * parallelism: every rebased query's plan windows on (key, _sw_shard)
  * with more sub-shard groups than keys. */
class ShardedWindowSpec extends AnyFunSpec with Matchers with SparkTestBase {

  describe("runningSum vs plain window") {
    it("matches sum().over(partitionBy(key).orderBy(...)) on random data") {
      import spark.implicits._
      val rnd = new Random(42)
      val rows = (1 to 2000).map { i =>
        (s"k${rnd.nextInt(4)}", i.toLong, rnd.nextInt(100).toLong)
      }
      val df = rows.toDF("k", "ord", "v")
      val expected = df.withColumn("cum",
        sum("v").over(Window.partitionBy("k").orderBy("ord")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val actual = ShardedWindow.runningSum(
        df, Seq("k"), expr("ord div 100"), Seq(col("ord")), col("v"), "cum")
      actual.orderBy("k", "ord").collect() shouldBe
        expected.orderBy("k", "ord").collect()
    }

    it("matches on a descending order with a negated shard") {
      import spark.implicits._
      val rnd = new Random(7)
      val rows = (1 to 1000).map { i =>
        (s"k${rnd.nextInt(3)}", i.toLong, rnd.nextInt(50).toLong)
      }
      val df = rows.toDF("k", "id", "sz")
      val expected = df.withColumn("cum",
        sum("sz").over(Window.partitionBy("k").orderBy(col("sz").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val actual = ShardedWindow.runningSum(
        df, Seq("k"), -expr("sz div 8"), Seq(col("sz").desc, col("id")),
        col("sz"), "cum")
      actual.orderBy("k", "id").collect() shouldBe
        expected.orderBy("k", "id").collect()
    }

    it("runningMin matches min().over(partitionBy(key).orderBy(...))") {
      import spark.implicits._
      val rnd = new Random(13)
      val rows = (1 to 2000).map { i =>
        (s"k${rnd.nextInt(4)}", i.toLong, rnd.nextInt(1000).toLong - 500)
      }
      val df = rows.toDF("k", "ord", "v")
      val expected = df.withColumn("m",
        min("v").over(Window.partitionBy("k").orderBy("ord")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val actual = ShardedWindow.runningMin(
        df, Seq("k"), expr("ord div 100"), Seq(col("ord")), col("v"), "m")
      actual.orderBy("k", "ord").collect() shouldBe
        expected.orderBy("k", "ord").collect()
    }

    it("runningMaxExclusive matches max().over(unboundedPreceding, -1)") {
      import spark.implicits._
      val rnd = new Random(29)
      val rows = (1 to 2000).map { i =>
        (s"k${rnd.nextInt(4)}", i.toLong, rnd.nextInt(1000).toLong - 500)
      }
      val df = rows.toDF("k", "ord", "v")
      val expected = df.withColumn("m",
        max("v").over(Window.partitionBy("k").orderBy("ord")
          .rowsBetween(Window.unboundedPreceding, -1)))
      val actual = ShardedWindow.runningMaxExclusive(
        df, Seq("k"), expr("ord div 100"), Seq(col("ord")), col("v"), "m")
      actual.orderBy("k", "ord").collect() shouldBe
        expected.orderBy("k", "ord").collect()
    }

    it("rowNumber matches row_number() on a total order") {
      import spark.implicits._
      val df = (1 to 500).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "id")
      val expected = df.withColumn("rn",
        row_number().over(Window.partitionBy("k").orderBy("id")).cast("long"))
      val actual = ShardedWindow.rowNumber(
        df, Seq("k"), expr("id div 50"), Seq(col("id")), "rn")
      actual.orderBy("k", "id").collect() shouldBe
        expected.orderBy("k", "id").collect()
    }

    it("rejects reserved column names") {
      import spark.implicits._
      val df = Seq(("a", 1L)).toDF("_sw_shard", "v")
      an[IllegalArgumentException] should be thrownBy
        ShardedWindow.runningSum(
          df, Seq("_sw_shard"), lit(0), Seq(col("v")), col("v"), "out")
    }
  }

  describe("rebased query plan shape") {
    // The low-cardinality-key scale fix is only real if the heavy
    // window in the plan partitions on (key, _sw_shard) — assert the
    // sub-shard column appears in a window spec, and that the data
    // actually splits each key into >1 sub-shard at spec scale.
    val rebased = Seq("corpus_pack", "corpus_token_budget",
      "corpus_quality_gate", "trace_concurrency", "trace_breach_runs")

    rebased.foreach { name =>
      it(s"$name windows on (key, _sw_shard)") {
        val plan = SparkEntry.allDefs(name).fn(spark, sfDir)
          .queryExecution.optimizedPlan.toString
        plan should include("_sw_shard")
      }
    }

    it("corpus_pack splits each lang into >1 sub-shard at spec scale") {
      val docs = Tables.documents(spark, sfDir)
      val shards = docs.select(col("lang"), expr("doc_id div 64").as("sh"))
        .distinct().count()
      val keys = docs.select("lang").distinct().count()
      shards should be > keys
    }

    it("trace_concurrency splits each service into >1 sub-shard at spec scale") {
      val ev = Tables.events(spark, sfDir)
      // span start times cover multiple hours → multiple shards/service
      val spansDf = graft.operators.SpanOps.spansFromEvents(ev)
      val shards = spansDf
        .select(col("service"), expr("start_us div 3600000000").as("sh"))
        .distinct().count()
      val keys = spansDf.select("service").distinct().count()
      shards should be > keys
    }
  }
}
