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

  /** The ANSI-totality lint (r11 verdict #6): InferFiltersFromConstraints
    * derives `isnotnull(<shard expr>)` from the offsets equi-join and can
    * push it ahead of the caller's own filters — an unguarded division in
    * the shard then throws DIVIDE_BY_ZERO on rows the caller believed
    * filtered (trace_theilsen_trend precedent). The lint lives INSIDE
    * every ShardedWindow entry point, so every call site — present and
    * future — is checked at plan-build time; these tests prove it fires,
    * and the enumeration test pins that all main-source sites go through
    * the linted entry points (tautological by construction, asserted so
    * a refactor that adds an unlinted entry point fails here). */
  describe("shard totality lint") {
    import spark.implicits._
    def df2 = Seq((1L, 2L, 3L), (4L, 0L, 5L)).toDF("ord", "d", "v")

    it("fails loudly on an unguarded fractional division in the shard") {
      val e = intercept[IllegalArgumentException] {
        ShardedWindow.runningSum(df2, Seq.empty, col("ord") / col("d"),
          Seq(col("ord")), col("v"), "out")
      }
      e.getMessage should include("unguarded division")
    }

    it("fails loudly on an unguarded integral div / modulo by a column") {
      intercept[IllegalArgumentException] {
        ShardedWindow.rowNumber(df2, Seq.empty, expr("ord div d"),
          Seq(col("ord")), "out")
      }
      intercept[IllegalArgumentException] {
        ShardedWindow.runningMin(df2, Seq.empty, expr("ord % d"),
          Seq(col("ord")), col("v"), "out")
      }
    }

    it("fails on a division hiding in a when() PREDICATE (not guarded by the branch)") {
      intercept[IllegalArgumentException] {
        ShardedWindow.runningSum(df2, Seq.empty,
          when(col("ord") / col("d") > 1, lit(1L)).otherwise(lit(0L)),
          Seq(col("ord")), col("v"), "out")
      }
    }

    it("accepts a when()-guarded division and a nonzero-literal divisor") {
      ShardedWindow.runningSum(df2, Seq.empty,
        when(col("d") =!= 0, col("ord") / col("d")).otherwise(lit(0.0)),
        Seq(col("ord")), col("v"), "out").count() shouldBe 2
      ShardedWindow.runningSum(df2, Seq.empty, expr("ord div 64"),
        Seq(col("ord")), col("v"), "out").count() shouldBe 2
    }

    it("rejects a literal zero (and integral -1 overflow) divisor outright") {
      intercept[IllegalArgumentException] {
        ShardedWindow.runningSum(df2, Seq.empty, expr("ord div 0"),
          Seq(col("ord")), col("v"), "out")
      }
      intercept[IllegalArgumentException] {
        ShardedWindow.runningSum(df2, Seq.empty, expr("ord div -1"),
          Seq(col("ord")), col("v"), "out")
      }
      intercept[IllegalArgumentException] {
        ShardedWindow.runningSum(df2, Seq.empty, expr("ord % -1"),
          Seq(col("ord")), col("v"), "out")
      }
    }

    it("accepts fractional division by literal -1.0 (only the integral family overflows at -1)") {
      ShardedWindow.runningSum(df2, Seq.empty, col("ord") / lit(-1.0),
        Seq(col("ord")), col("v"), "out").count() shouldBe 2
    }

    it("every main-source call site resolves through a linted entry point") {
      import java.nio.file.{Files, Paths}
      import scala.jdk.CollectionConverters._
      import scala.util.Using
      // anchor at the build root (the dir holding build.sbt), walking up
      // from CWD — the suite must not silently depend on the runner's
      // working directory being the repo root (r12 advice)
      val buildRoot = Iterator.iterate(Paths.get("").toAbsolutePath)(_.getParent)
        .takeWhile(_ != null).take(8)
        .find(d => Files.exists(d.resolve("build.sbt")))
        .getOrElse(fail("no build.sbt found walking up from CWD — cannot locate main sources"))
      val root = buildRoot.resolve("src/main/scala")
      withClue(s"main-source root missing at $root: ") {
        Files.isDirectory(root) shouldBe true
      }
      val call = """ShardedWindow\.(runningSum|runningMin|runningMaxExclusive|rowNumber)\s*\(""".r
      // Using closes the Files.walk stream (it holds directory handles)
      val sites = Using.resource(Files.walk(root)) { walk =>
        walk.iterator().asScala
          .filter(_.toString.endsWith(".scala"))
          .flatMap { p =>
            val src = Files.readString(p)
            // strip block/line comments so Scaladoc mentions don't count
            val code = src.replaceAll("(?s)/\\*.*?\\*/", "").replaceAll("(?m)//.*$", "")
            call.findAllIn(code).map(_ => p.toString)
          }.toList
      }
      // the object itself defines the four entry points; every external
      // site is a call to one of them, and each body runs checkShardTotal
      // (rowNumber by delegation to runningSum)
      sites.size should be >= 30
      val swSrc = Files.readString(
        root.resolve("graft/operators/ShardedWindow.scala"))
      // r13: all three scan entry points route through the shared
      // partitioned() helper (one lint + one explicit exchange); the
      // lint itself runs exactly once there
      "val parted = partitioned\\(df, keys, shard, value\\)".r
        .findAllIn(swSrc).size shouldBe 3
      "checkShardTotal\\(tagged\\)".r.findAllIn(swSrc).size shouldBe 1
      swSrc should include("runningSum(df, keys, shard, order, lit(1L), out, keyTotalOut)")
      info(s"${sites.size} ShardedWindow call sites enumerated, all linted: " +
        sites.groupBy(identity).map { case (f, xs) => s"${f.split('/').last}×${xs.size}" }
          .toSeq.sorted.mkString(", "))
    }
  }
}
