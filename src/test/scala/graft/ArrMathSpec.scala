package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Pins the native array-math kernels' exactness contract against the
  * higher-order forms they replaced: bit-identical double folds,
  * identical integer sums, mirrored null semantics (mismatched lengths,
  * null elements), ANSI-like overflow, and the codegen path. */
class ArrMathSpec extends AnyFunSpec with Matchers with SparkTestBase {

  import spark.implicits._

  private def dotHof(v: org.apache.spark.sql.Column, w: org.apache.spark.sql.Column) =
    aggregate(zip_with(v, w, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def l2Hof(v: org.apache.spark.sql.Column, w: org.apache.spark.sql.Column) =
    aggregate(zip_with(v, w, (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)

  describe("arr_dot") {
    it("is bit-identical to the interpreted aggregate(zip_with) fold on the corpus") {
      val e = graft.operators.VectorOps.withNorms(Tables.embeddings(spark, sfDir))
        .limit(200)
      val pairs = e.select(col("vec_id").as("a"), col("v").as("va"))
        .crossJoin(e.select(col("vec_id").as("b"), col("v").as("vb")))
        .filter(col("a") < col("b")).limit(5000)
      val diff = pairs.select(
        graft.operators.VectorOps.dot(col("va"), col("vb")).as("nat"),
        dotHof(col("va"), col("vb")).as("hof"))
        // bit-level comparison — a ±ulp drift would round away in ==
        .filter(expr("CAST(nat AS STRING) <> CAST(hof AS STRING)") ||
          col("nat") =!= col("hof"))
        .count()
      diff shouldBe 0L
    }

    it("mirrors zip_with null semantics: mismatched lengths and null elements") {
      val df = Seq(
        (Seq(1.0, 2.0), Seq(3.0, 4.0)), // 11.0
        (Seq(1.0, 2.0), Seq(3.0)) // length mismatch -> null
      ).toDF("a", "b")
      val rows = df.select(
        graft.operators.VectorOps.dot(col("a"), col("b")).as("nat"),
        dotHof(col("a"), col("b")).as("hof")).collect()
      rows(0).getDouble(0) shouldBe 11.0
      rows(0).getDouble(1) shouldBe 11.0
      rows(1).isNullAt(0) shouldBe true
      rows(1).isNullAt(1) shouldBe true
    }
  }

  describe("arr_l2sq") {
    it("equals the integer HOF sum and throws on overflow like ANSI") {
      val df = Seq((Seq(1L, 5L, -3L), Seq(2L, 2L, 2L))).toDF("a", "b")
      val r = df.select(
        graft.operators.VectorOps.l2sq(col("a"), col("b")).as("nat"),
        l2Hof(col("a"), col("b")).as("hof")).head()
      r.getLong(0) shouldBe (1 + 9 + 25)
      r.getLong(1) shouldBe r.getLong(0)
      val big = Seq((Seq(Long.MaxValue / 2), Seq(-(Long.MaxValue / 2))))
        .toDF("a", "b")
      // constant folding may evaluate driver-side (raw
      // ArithmeticException) or in a task (wrapped SparkException) —
      // either way the overflow must THROW, never wrap silently
      val ex = intercept[Throwable] {
        big.select(graft.operators.VectorOps.l2sq(col("a"), col("b"))).collect()
      }
      ex.toString.toLowerCase should include("overflow")
    }

    it("evaluates inside whole-stage codegen (no interpreted fallback)") {
      val e = Tables.embeddings(spark, sfDir).limit(10)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))").as("q"))
      val plan = e.select(graft.operators.VectorOps.l2sq(col("q"), col("q")).as("d"))
        .queryExecution.executedPlan.toString
      // the simple-plan codegen marker is the `*(n)` stage prefix on
      // the projecting operator
      plan.linesIterator.exists(l =>
        l.contains("arr_l2sq") && l.trim.replaceFirst("^\\+- ", "").startsWith("*(")) shouldBe true
      e.select(graft.operators.VectorOps.l2sq(col("q"), col("q")).as("d"))
        .collect().foreach(_.getLong(0) shouldBe 0L)
    }
  }
}
