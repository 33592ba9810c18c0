package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Every SURVEY.md §2 query runs on sf0.001 and returns a sane shape.
  * Exact-value correctness is covered by the DuckDB oracle gate
  * (tools/check_oracle.py locally, t2 in the driver). */
class QueriesSpec extends AnyFunSpec with Matchers with SparkTestBase {

  // queries whose result can legitimately be empty at sf0.001
  private val mayBeEmpty = Set("dedup_ngram_jaccard", "neardup_cosine", "q_having", "ann_topk_lsh",
    "neardup_cosine_lsh", "neardup_cosine_lsh_banded",
    // needs a 20-day run where BOTH nations trade - absent at sf0.001
    "q_rolling_corr")

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

    it("contains no Scala-null interpolation artifacts") {
      // a helper val declared AFTER a `defs` map initializes as null at
      // map-build time and interpolates as the lowercase token `null`
      // (bit twice: kcoreOracle round 9, poissonWBody round 9); SQL's
      // own NULL keyword is uppercase by convention and lowercase null
      // only appears in `--` comments
      val offenders = SparkEntry.oracleSql.flatMap { case (name, sql) =>
        sql.linesIterator.zipWithIndex.collect {
          case (line, i)
              if !line.trim.startsWith("--") &&
                "(^|[^A-Za-z_])null([^A-Za-z_]|$)".r
                  .findFirstIn(line.replaceAll("--.*$", "")).isDefined =>
            s"$name:${i + 1}: $line"
        }
      }
      offenders shouldBe empty
    }
  }
}
