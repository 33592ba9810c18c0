package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class MinHashSigSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private lazy val shingled = {
    GraftExtensions.register(spark)
    // the query pack's single shingling definition
    graft.queries.TextQueries.shingleArrays(spark, sfDir, Int.MaxValue, doubled = false)
  }

  describe("MinHashSig native expression") {
    it("is bit-identical to the declarative explode + per-seed min build") {
      val declarative = shingled
        .select(col("doc_id"), explode(col("shingles")).as("shingle"))
        .withColumn("j", explode(lit((0 to 7).toArray)))
        .withColumn("h",
          conv(substring(md5(concat(col("j").cast("string"), lit(":"), col("shingle"))), 1, 8), 16, 10)
            .cast("long"))
        .groupBy("doc_id")
        .agg(collect_list(struct(col("j"), col("h"))).as("hs"))
        .collect().map { r =>
          val mins = Array.fill(8)(Long.MaxValue)
          r.getSeq[org.apache.spark.sql.Row](1).foreach { s =>
            val (j, h) = (s.getInt(0), s.getLong(1))
            if (h < mins(j)) mins(j) = h
          }
          r.getLong(0) -> mins.toSeq
        }.toMap
      val native = shingled.selectExpr("doc_id", "minhash_sig(shingles, 8) AS sig")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      native shouldBe declarative
    }

    it("ignores duplicate shingles (distinct-set semantics)") {
      val s = spark
      import s.implicits._
      val dup = Seq((1L, Seq("x y z", "a b c", "x y z")), (2L, Seq("a b c", "x y z")))
        .toDF("doc_id", "shingles")
      val sigs = dup.selectExpr("doc_id", "minhash_sig(shingles, 8) AS sig")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      sigs(1L) shouldBe sigs(2L)
    }

    it("computes signatures without any exchange") {
      val plan = shingled.selectExpr("doc_id", "minhash_sig(shingles, 8) AS sig")
        .queryExecution.executedPlan.toString
      plan should not include "Exchange"
      plan should include("minhash_sig")
    }

    it("returns null for empty shingle arrays") {
      val s = spark
      import s.implicits._
      val empty = Seq((1L, Seq.empty[String])).toDF("doc_id", "shingles")
      empty.selectExpr("minhash_sig(shingles, 4) AS sig")
        .collect().head.isNullAt(0) shouldBe true
    }

    it("survives a non-nullable child yielding an empty array (codegen null path)") {
      val s = spark
      import s.implicits._
      val df = Seq((1L, Seq.empty[String])).toDF("doc_id", "shingles")
        .selectExpr("doc_id", "minhash_sig(coalesce(shingles, array('z')), 4) AS sig")
      df.filter(org.apache.spark.sql.functions.col("sig").isNull).count() shouldBe 1L
    }

    it("rejects a non-literal hash count at analysis") {
      assertThrows[Exception] {
        Tables.documents(spark, sfDir)
          .selectExpr("minhash_sig(array(text), CAST(doc_id AS INT))").collect()
      }
    }
  }
}
