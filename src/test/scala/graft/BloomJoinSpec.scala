package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class BloomJoinSpec extends AnyFunSpec with Matchers with SparkTestBase {

  describe("BloomJoin") {
    it("equals the plain semi join on real data (long keys)") {
      val li = Tables.lineitem(spark, sfDir)
      val urgent = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      val bloomed = BloomJoin.semiJoin(li, urgent, "l_orderkey", "o_orderkey", 10000L)
        .select("l_orderkey", "l_linenumber").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      val plain = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
        .select("l_orderkey", "l_linenumber").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      bloomed should not be empty
      bloomed shouldBe plain
    }

    it("equals the plain semi join on string keys") {
      val s = spark
      import s.implicits._
      val big = (0 until 1000).map(i => (s"k$i", i)).toDF("k", "v")
      val small = (0 until 50).map(i => s"k${i * 3}").toDF("k2")
      val bloomed = BloomJoin.semiJoin(big, small, "k", "k2", 1000L)
        .select("k", "v").collect().map(r => (r.getString(0), r.getInt(1))).toSet
      val plain = big.join(small, big("k") === small("k2"), "left_semi")
        .select("k", "v").collect().map(r => (r.getString(0), r.getInt(1))).toSet
      bloomed should not be empty
      bloomed shouldBe plain
    }

    it("prefilter drops most non-members at production fpp") {
      val s = spark
      import s.implicits._
      val big = (0 until 20000).map(_.toLong).toDF("k")
      val small = (0 until 100).map(_.toLong * 200).toDF("k2")
      val kept = BloomJoin.prefilter(big, small, "k", "k2", 1000L, fpp = 0.01).count()
      // 100 true members + ~1% fp of the other 19 900 — far below the full scan
      kept should be >= 100L
      kept should be < 600L
    }

    it("probes inside the scan stage as a codegen'd filter") {
      val li = Tables.lineitem(spark, sfDir)
      val urgent = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      val plan = BloomJoin.prefilter(li, urgent, "l_orderkey", "o_orderkey", 10000L)
        .queryExecution.executedPlan.toString
      plan should include("bloom_might_contain")
      // the "*(n)" prefix marks the filter fused into whole-stage codegen
      plan should include regex """\*\(\d+\) Filter"""
    }
  }
}
