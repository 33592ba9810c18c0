package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Every SURVEY.md §2 query runs on sf0.001 and returns a sane shape.
  * Exact-value correctness is covered by the DuckDB oracle gate
  * (tools/check_oracle.py locally, t2 in the driver). */
class QueriesSpec extends AnyFunSpec with Matchers with SparkTestBase {

  // queries whose result can legitimately be empty at sf0.001
  private val mayBeEmpty = Set("dedup_ngram_jaccard", "neardup_cosine", "q_having", "ann_topk_lsh",
    "neardup_cosine_lsh", "neardup_cosine_lsh_banded")

  SparkEntry.allDefs.foreach { case (name, qd) =>
    describe(s"query $name") {
      it("runs and returns rows") {
        val df = qd.fn(spark, sfDir)
        val n = df.count()
        if (!mayBeEmpty(name)) {
          assert(n > 0, s"$name returned no rows")
        }
        df.columns.length should be > 0
      }
    }
  }

  describe("entry") {
    it("returns the flagship result") {
      SparkEntry.entry(spark).count() should be > 0L
    }
  }

  describe("oracleSql") {
    it("covers every SQL-expressible query") {
      SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet) shouldBe true
    }
  }
}
