package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class TextOpsSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private lazy val sig = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
    TextOps.simHash(docs, "doc_id", "t").cache()
  }

  describe("simHashPairs (pigeonhole banding)") {
    it("finds exactly the pairs the all-pairs join finds") {
      val a = sig.select(col("doc_id").as("d1"), col("simhash").as("h1"))
      val b = sig.select(col("doc_id").as("d2"), col("simhash").as("h2"))
      val allPairs = a.join(b, col("d1") < col("d2"))
        .select(col("d1"), col("d2"),
          bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long").as("hamming"))
        .filter(col("hamming") <= 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val banded = TextOps.simHashPairs(sig, "doc_id", "simhash", 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      banded shouldBe allPairs
    }

    it("generates candidates through an equi-join, not a nested-loop scan") {
      val plan = TextOps.simHashPairs(sig, "doc_id", "simhash", 6)
        .queryExecution.executedPlan.toString
      plan should not include "NestedLoop"
      plan should not include "Cartesian"
    }

    it("emits each qualifying pair exactly once") {
      val rows = TextOps.simHashPairs(sig, "doc_id", "simhash", 6)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
      rows.distinct.length shouldBe rows.length
    }
  }
}
