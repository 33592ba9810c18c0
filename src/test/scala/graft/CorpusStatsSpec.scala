package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Semantic invariants + scale plan shapes for the round-8 corpus
  * statistics surfaces (text_vocab_growth, corpus_source_overlap,
  * embed_covariance, trace_orphan_rate). Exact values are pinned by the
  * DuckDB oracle gate; these pin the properties the oracle can't state.
  */
class CorpusStatsSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private def run(name: String) = SparkEntry.allDefs(name).fn(spark, sfDir)
  private def plan(name: String): String =
    run(name).queryExecution.executedPlan.toString

  describe("text_vocab_growth") {
    it("is cumulative-monotone and ends at the corpus totals") {
      val rows = run("text_vocab_growth").orderBy("ck").collect()
      rows.length shouldBe 10
      rows.sliding(2).foreach { case Array(a, b) =>
        b.getLong(1) should be >= a.getLong(1) // cum_docs
        b.getLong(2) should be >= a.getLong(2) // cum_tokens
        b.getLong(3) should be >= a.getLong(3) // cum_vocab
      }
      val docs = Tables.documents(spark, sfDir)
      val totalDocs = docs.count()
      val totalVocab = docs
        .select(explode(split(trim(col("text")), "\\s+")).as("t"))
        .agg(countDistinct("t")).head.getLong(0)
      rows.last.getLong(1) shouldBe totalDocs
      rows.last.getLong(3) shouldBe totalVocab
      // Heaps exponent: sublinear vocabulary growth, log V / log T in (0, 1]
      rows.foreach { r =>
        val ratio = r.getDouble(4)
        ratio should be > 0.0
        ratio should be <= 1.0
      }
    }
  }

  describe("corpus_source_overlap") {
    it("bounds every pair by its vocabularies and never self-pairs") {
      val rows = run("corpus_source_overlap").collect()
      rows.length should be > 0
      rows.foreach { r =>
        val (s1, s2) = (r.getString(0), r.getString(1))
        s1 should be < s2 // sorted collect_set ⇒ ordered, distinct pair
        val (common, n1, n2, ppm) =
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        common should be <= math.min(n1, n2)
        ppm should be >= 0L
        ppm should be <= 1000000L
        ppm shouldBe (common * 1000000L) / (n1 + n2 - common)
      }
    }
    it("never sort-merge-joins the term relation to itself") {
      // intersections come from row-local pair generation; the only
      // joins touch the ≤C(#sources,2)-row aggregates (broadcast)
      val p = plan("corpus_source_overlap")
      p should include("Generate")
      p should not include "SortMergeJoin"
      p should not include "CartesianProduct"
    }
  }

  describe("embed_covariance") {
    it("has nonnegative diagonal matching the independent variance") {
      val rows = run("embed_covariance").collect()
      rows.length shouldBe 64 * 65 / 2
      val diag = rows.filter(r => r.getLong(0) == r.getLong(1))
      diag.length shouldBe 64
      diag.foreach(r => r.getLong(3) should be >= 0L)
      // cross-check one diagonal entry against a direct exact computation:
      // cov_micro = (n*sxx - sx*sx) div n^2 in arbitrary-precision integers
      val x1 = Tables.embeddings(spark, sfDir)
        .select(expr("CAST(ROUND(CAST(embedding[0] AS DOUBLE) * 1000, 0) AS BIGINT)").as("q"))
        .agg(count(lit(1)).as("n"), sum("q").as("s"), sum(col("q") * col("q")).as("ss"))
        .head
      val (n, sx, sxx) = (BigInt(x1.getLong(0)), BigInt(x1.getLong(1)), BigInt(x1.getLong(2)))
      val expected = ((n * sxx - sx * sx) / (n * n)).toLong
      val got = rows.find(r => r.getLong(0) == 1 && r.getLong(1) == 1).get.getLong(3)
      got shouldBe expected
    }
    it("generates pairs row-locally — no join in the plan") {
      val p = plan("embed_covariance")
      p should not include "Join"
      p should include("HashAggregate")
      p should include("Generate")
    }
  }

  describe("trace_orphan_rate") {
    it("keeps orphans within span counts and recomputes ppm exactly") {
      val rows = run("trace_orphan_rate").collect()
      rows.length should be > 0
      rows.foreach { r =>
        val (n, orph, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
        orph should be >= 0L
        orph should be <= n
        ppm shouldBe (orph * 1000000L) / n
      }
      // the 1/16 md5 loss on a chain tree must orphan SOMETHING
      rows.map(_.getLong(2)).sum should be > 0L
    }
  }
}
