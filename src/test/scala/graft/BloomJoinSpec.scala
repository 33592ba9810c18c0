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

    it("sizes the filter past the runtime-filter conf clamp") {
      // Spark 4's stat.bloomFilter clamps numBits at
      // spark.sql.optimizer.runtime.bloomFilter.maxNumBits (2^26):
      // sized for 21M keys @1% that clamp silently yields a 76%-fpp
      // filter (measured at sf100 — 476M of 600M probe rows passed
      // instead of 90M). BloomJoin.build passes explicit literals, so
      // the requested sizing must survive unclamped.
      val s = spark
      import s.implicits._
      val tiny = (0 until 10).map(_.toLong).toDF("k")
      val bloom = BloomJoin.build(tiny, "k", expectedItems = 50000000L, fpp = 0.01)
      val want = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(50000000L, 0.01)
      // allocation rounds to the implementation's word granularity —
      // assert it is the optimal size's neighborhood, far past the clamp
      bloom.bitSize() should be >= (want - 64)
      bloom.bitSize() should be > 67108864L
      (0 until 10).foreach(i => bloom.mightContainLong(i.toLong) shouldBe true)
    }

    it("returns an all-absent filter for an empty build side") {
      val s = spark
      import s.implicits._
      val big = (0 until 100).map(_.toLong).toDF("k")
      val none = spark.emptyDataFrame.withColumn("k2", lit(1L)).filter(lit(false))
        .select("k2")
      BloomJoin.semiJoin(big, none, "k", "k2").count() shouldBe 0L
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
