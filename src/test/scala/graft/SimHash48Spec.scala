package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class SimHash48Spec extends AnyFunSpec with Matchers with SparkTestBase {

  private lazy val toks = Tables.documents(spark, sfDir)
    .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))

  describe("SimHash48 native expression") {
    it("is bit-identical to the declarative explode+vote build on real documents") {
      val declarative = TextOps.simHash(toks, "doc_id", "t")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val native = TextOps.simHashNative(toks, "doc_id", "t")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      native shouldBe declarative
    }

    it("votes each distinct token once, like array_distinct in the declarative path") {
      val s = spark
      import s.implicits._
      GraftExtensions.register(spark)
      val dup = Seq((1L, Seq("a", "b", "a", "a")), (2L, Seq("a", "b")))
        .toDF("doc_id", "t")
      val sigs = TextOps.simHashNative(dup, "doc_id", "t")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      sigs(1L) shouldBe sigs(2L)
    }

    it("computes signatures without any exchange before banding") {
      val plan = TextOps.simHashNative(toks, "doc_id", "t")
        .queryExecution.executedPlan.toString
      plan should not include "Exchange"
      plan should include("simhash48")
    }

    it("stays inside whole-stage codegen") {
      val plan = TextOps.simHashNative(toks, "doc_id", "t")
        .queryExecution.executedPlan.toString
      plan should include("*(1) Project")
    }

    it("fits in 48 bits") {
      TextOps.simHashNative(toks, "doc_id", "t")
        .collect().foreach { r =>
          val sig = r.getLong(1)
          sig should be >= 0L
          (sig >>> 48) shouldBe 0L
        }
    }

    it("emits no row for token-less docs, like the declarative explode") {
      val s = spark
      import s.implicits._
      GraftExtensions.register(spark)
      val mixed = Seq((1L, Seq("a", "b")), (2L, Seq.empty[String]))
        .toDF("doc_id", "t")
      val ids = TextOps.simHashNative(mixed, "doc_id", "t")
        .collect().map(_.getLong(0)).toSeq
      ids shouldBe Seq(1L)
    }

    it("survives a non-nullable child yielding an empty array (codegen null path)") {
      val s = spark
      import s.implicits._
      GraftExtensions.register(spark)
      val df = Seq((1L, Seq.empty[String])).toDF("doc_id", "t")
        .selectExpr("doc_id", "simhash48(coalesce(t, array('z'))) AS sig")
      df.filter(col("sig").isNull).count() shouldBe 1L
    }

    it("rejects non-array input at analysis") {
      GraftExtensions.register(spark)
      assertThrows[Exception] {
        Tables.documents(spark, sfDir).selectExpr("simhash48(text)").collect()
      }
    }
  }
}
