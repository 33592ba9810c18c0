package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** AQE is the third leg of the skew strategy (SURVEY §4) next to
  * SkewOps' explicit salting: a runtime-detected hot key must be split
  * by the adaptive planner WITHOUT any query rewrite. This pins the
  * behavior — and the thresholds that enable it at test scale — so a
  * Spark upgrade can't silently drop the safety net the 100 TB posture
  * leans on for unforeseen skew.
  */
class AqeSkewJoinSpec extends AnyFunSpec with Matchers with SparkTestBase {

  it("splits a runtime-detected hot key in a sort-merge join") {
    val s = spark
    import s.implicits._
    val prev = Map(
      "spark.sql.adaptive.enabled" -> s.conf.get("spark.sql.adaptive.enabled"),
      "spark.sql.adaptive.skewJoin.enabled" ->
        s.conf.get("spark.sql.adaptive.skewJoin.enabled"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        s.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        s.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        s.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // production defaults detect 256 MB partitions; scale the
      // thresholds down so the planted skew is detectable at test size
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // 200k rows on ONE key vs 64 cold keys; payload widens the hot
      // partition well past the threshold
      val big = s.range(200000).select(
        when($"id" < 190000, lit(7L)).otherwise($"id" % 64).as("k"),
        concat(lit("x"), $"id".cast("string"), lit("padpadpadpadpadpad")).as("payload"))
      val dim = s.range(64).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = big.join(dim, "k")
      // drive THIS dataset's own query execution (count() would build
      // and adapt a separate plan, leaving this one un-finalized)
      joined.collect().length shouldBe 200000

      val adaptive = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }.get
      val finalPlan = adaptive.executedPlan.toString
      // SMJ nodes print "skew=true" once the runtime split happened
      finalPlan should include("skew=true")
    } finally prev.foreach { case (k, v) => s.conf.set(k, v) }
  }
}
