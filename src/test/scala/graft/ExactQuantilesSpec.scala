package graft

import graft.operators.ExactQuantiles
import graft.operators.ExactQuantiles.{Cont, Disc}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ExactQuantiles vs the builtin buffering aggregates: identical
  * numbers on longs and doubles, ties, odd/even group sizes, and
  * weighted input — plus the plan property the operator exists for
  * (no per-group TypedImperativeAggregate buffer in the plan). */
class ExactQuantilesSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // deterministic mixed data: 4 groups with different sizes/parity,
  // heavy ties (v % 7), one spread-out tail
  private lazy val longs: DataFrame = (1 to 997).map { i =>
    val g = s"g${i % 4}"
    val v = if (i % 19 == 0) (i * 131L) % 10000 else (i % 7).toLong * 100
    (g, v)
  }.toDF("g", "v").cache()

  private lazy val doubles: DataFrame =
    longs.select(col("g"), (col("v") * 1.37 + 0.25).as("v")).cache()

  private def viaOp(df: DataFrame): DataFrame =
    ExactQuantiles.percentiles(df, Seq("g"), col("v"), shardWidth = 256.0,
      pcts = Seq(Disc("p50d", 1, 2), Disc("p95d", 19, 20),
        Cont("p50c", 1, 2), Cont("p95c", 19, 20), Cont("med", 1, 2)),
      countOut = Some("n"))
      .select("g", "p50d", "p95d", "p50c", "p95c", "med", "n")
      .orderBy("g")

  private def viaBuiltin(df: DataFrame): DataFrame = {
    df.createOrReplaceTempView("eq_spec_in")
    df.sparkSession.sql("""
      |SELECT g,
      |  percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS p50d,
      |  percentile_disc(0.95) WITHIN GROUP (ORDER BY v) AS p95d,
      |  percentile(v, 0.5) AS p50c,
      |  percentile(v, 0.95) AS p95c,
      |  median(v) AS med,
      |  count(v) AS n
      |FROM eq_spec_in GROUP BY g ORDER BY g""".stripMargin)
  }

  test("matches the builtins bit-for-bit on long values") {
    assert(viaOp(longs).collect().toSeq === viaBuiltin(longs).collect().toSeq)
  }

  test("matches the builtins bit-for-bit on double values") {
    assert(viaOp(doubles).collect().toSeq === viaBuiltin(doubles).collect().toSeq)
  }

  test("weighted input matches percentile(v, p, freq)") {
    val weighted = longs.withColumn("w", (col("v") % 5 + 1).cast("long"))
    val op = ExactQuantiles.percentiles(weighted, Seq("g"), col("v"),
      shardWidth = 256.0,
      pcts = Seq(Cont("p50c", 1, 2), Cont("p95c", 19, 20)),
      weight = col("w"), countOut = Some("tw"))
      .select("g", "p50c", "p95c", "tw").orderBy("g")
    weighted.createOrReplaceTempView("eq_spec_w")
    val builtin = spark.sql("""
      |SELECT g, percentile(v, 0.5, w) AS p50c, percentile(v, 0.95, w) AS p95c,
      |       sum(w) AS tw
      |FROM eq_spec_w GROUP BY g ORDER BY g""".stripMargin)
    assert(op.collect().toSeq === builtin.collect().toSeq)
  }

  test("single-row and two-row groups (interpolation edges)") {
    val tiny = Seq(("a", 10L), ("b", 10L), ("b", 20L)).toDF("g", "v")
    val got = ExactQuantiles.percentiles(tiny, Seq("g"), col("v"),
      shardWidth = 16.0, pcts = Seq(Cont("med", 1, 2), Disc("p50d", 1, 2)))
      .select("g", "med", "p50d").orderBy("g").collect()
    assert(got.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ===
      Seq(("a", 10.0, 10L), ("b", 15.0, 10L)))
  }

  test("nulls are dropped like the builtins drop them") {
    val withNulls = longs.withColumn("v",
      when(col("v") === 200L, lit(null)).otherwise(col("v")))
    assert(viaOp(withNulls).collect().toSeq === viaBuiltin(withNulls).collect().toSeq)
  }

  test("percentilesFromCounts matches the sharded path and the builtins") {
    // pre-agg counts (with deliberate DUPLICATE (g, v) rows — the
    // contract says weights add) must give the same answers
    val counts = longs.groupBy("g", "v").agg(count(lit(1)).as("cnt"))
      .withColumn("half", (col("cnt") / 2).cast("long"))
      .withColumn("rest", col("cnt") - col("half"))
    val dup = counts.filter(col("half") > 0)
      .select(col("g"), col("v"), col("half").as("cnt"))
      .unionAll(counts.select(col("g"), col("v"), col("rest").as("cnt")))
      .filter(col("cnt") > 0)
    val got = ExactQuantiles.percentilesFromCounts(dup, Seq("g"), col("v"),
      weight = col("cnt"),
      pcts = Seq(Disc("p50d", 1, 2), Disc("p95d", 19, 20),
        Cont("p50c", 1, 2), Cont("p95c", 19, 20), Cont("med", 1, 2)),
      countOut = Some("n"))
      .select("g", "p50d", "p95d", "p50c", "p95c", "med", "n")
      .orderBy("g")
    assert(got.collect().toSeq === viaBuiltin(longs).collect().toSeq)
  }

  test("property: random rational percentiles match the builtin on both paths") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 4) {
      val n = 50 + rnd.nextInt(200)
      val data = (1 to n).map(i => ("g" + (i % 3), rnd.nextInt(40).toLong * 25))
      val df = data.toDF("g", "v")
      val ps = Seq.fill(3)(1 + rnd.nextInt(99))
      val pcts = ps.zipWithIndex.flatMap { case (p, i) =>
        Seq(Disc(s"d$i", p, 100), Cont(s"c$i", p, 100)) }
      val outCols = "g" +: pcts.map(_.out)
      val sharded = ExactQuantiles.percentiles(df, Seq("g"), col("v"),
        shardWidth = 64.0, pcts = pcts)
        .select(outCols.head, outCols.tail: _*).orderBy("g").collect().toSeq
      val compact = ExactQuantiles.percentilesFromCounts(
        df.groupBy("g", "v").agg(count(lit(1)).as("cnt")),
        Seq("g"), col("v"), weight = col("cnt"), pcts = pcts)
        .select(outCols.head, outCols.tail: _*).orderBy("g").collect().toSeq
      df.createOrReplaceTempView("eq_prop_in")
      val sqlCols = ps.zipWithIndex.flatMap { case (p, i) =>
        val lit = p / 100.0 // same double the rational num/den reduces to
        Seq(s"percentile_disc($lit) WITHIN GROUP (ORDER BY v) AS d$i",
          s"percentile(v, $lit) AS c$i") }
      val builtin = spark.sql(
        s"SELECT g, ${sqlCols.mkString(", ")} FROM eq_prop_in GROUP BY g ORDER BY g")
        .collect().toSeq
      assert(sharded === builtin, s"sharded path diverged for ps=$ps")
      assert(compact === builtin, s"compact path diverged for ps=$ps")
    }
  }

  test("compact path plans one per-key sort, no sharding machinery") {
    val counts = longs.groupBy("g", "v").agg(count(lit(1)).as("cnt"))
    val p = ExactQuantiles.percentilesFromCounts(counts, Seq("g"), col("v"),
        weight = col("cnt"), pcts = Seq(Disc("p50d", 1, 2)))
      .queryExecution.executedPlan.toString
    assert(!p.contains("_sw_shard"), "sharded machinery leaked into compact path")
    // both window frames (running cum + full-partition n) share the one
    // per-key partitioning; anything above 2 Window nodes means a
    // replan added exchanges
    assert("\\bWindow".r.findAllIn(p).size <= 2, s"unexpected window count:\n$p")
  }

  test("plan has no TypedImperative percentile buffer, and prefix sums shard") {
    val plan = viaOp(longs).queryExecution.executedPlan.toString
    assert(!plan.contains("percentile"), "builtin percentile leaked into the plan")
    // the sharded window partitions by (g, _sw_shard), not g alone
    assert(plan.contains("_sw_shard"), "ShardedWindow sub-sharding missing")
  }
}
