package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Plan-shape regression guards for the round-6 query surfaces: the
  * properties that make them survive a 100 TB scale-up, asserted on
  * the physical plan so a Spark upgrade or refactor can't silently
  * regress them to a shuffle/loop shape.
  */
class QueryPlanShapeSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.allDefs(name).fn(spark, sfDir).queryExecution.executedPlan.toString

  describe("round-6 plan shapes") {
    it("text_tfidf pushes the per-doc argmax below the shuffle and broadcasts df") {
      val p = plan("text_tfidf")
      // rank-limit pushdown: top-1-per-doc runs map-side before the
      // window exchange, so the full (doc,term) table never shuffles twice
      p should include("WindowGroupLimit")
      // the document-frequency side joins in as a broadcast, not a
      // term-keyed shuffle join that a hot stopword key would skew
      p should include("BroadcastHashJoin")
      p should not include "SortMergeJoin"
    }

    it("q_lateral decorrelates to a partitioned rank, not a per-row nested loop") {
      val p = plan("q_lateral")
      // the LIMIT'd correlated subquery becomes a per-custkey rank...
      p should include("Window")
      // ...with the correlation domain (c_custkey <= 100) INFERRED
      // onto the orders scan, so the rank never runs over the full table
      p should include("LessThanOrEqual(o_custkey,100)")
      p should not include "CartesianProduct"
    }

    it("trace_gapfill joins grid-bounded sides by broadcast") {
      val p = plan("trace_gapfill")
      // both join inputs are (services × hours)-bounded aggregates —
      // the span table's size must never force this to sort-merge
      p should include("BroadcastHashJoin")
      p should include("LeftOuter")
      p should not include "SortMergeJoin"
    }

    it("corpus_mix keeps the per-doc keep decision row-local against a broadcast rate table") {
      val p = plan("corpus_mix")
      p should include("BroadcastHashJoin")
      p should not include "SortMergeJoin"
    }
  }
}
