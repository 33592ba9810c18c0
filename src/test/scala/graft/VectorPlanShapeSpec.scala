package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Plan-shape regression guards for the dedup/ANN scale claims: LSH
  * candidate generation must stay an EQUI-join on bucket keys (a
  * cross/nested-loop join here is the quadratic blowup the operators
  * exist to avoid), band keys must come from the single native
  * expression (the declarative tree exceeds the JVM's 64 KB method
  * limit and silently drops to interpreted eval ~17× slower), and
  * decontamination must anti-join a broadcast probe-hit set (its
  * row-local form re-tokenizes per lambda element access, measured
  * 65× slower). */
class VectorPlanShapeSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  describe("banded LSH candidate plan") {
    lazy val plan = VectorOps
      .cosineNearDupCandidatesLshBanded(emb, 300, 64, bitsPerBand = 5, bands = 6)
      .queryExecution.executedPlan.toString

    it("joins candidates on bucket equality, never a cross product") {
      plan should not include "CartesianProduct"
      plan should not include "BroadcastNestedLoopJoin"
    }

    it("computes band keys with the native expression, not a plane tree") {
      plan should include("lsh_band_keys")
      // the declarative form carried hundreds of element_at terms; the
      // native plan carries none outside the verify-side dot products
      "element_at".r.findAllIn(plan).length shouldBe 0
    }
  }

  describe("corpus_decontaminate plan") {
    lazy val plan = SparkEntry.queries("corpus_decontaminate")(spark, sfDir)
      .queryExecution.executedPlan.toString

    it("drops contaminated docs via a broadcast left-anti join") {
      plan should include("LeftAnti")
      plan should include("BroadcastHashJoin")
    }

    it("explodes shingles inline in the Generate") {
      // the generator must carry the transform expression itself — an
      // attribute reference here means an upstream projection
      // materialized the array (the 25× explode trap)
      "Generate explode\\(array_distinct\\(transform\\(".r
        .findAllIn(plan).length should be >= 1
    }
  }

  describe("semDeDup plan") {
    lazy val plan = VectorOps.semDeDup(emb, nCentroids = 8, threshold = 0.4)
      .queryExecution.executedPlan.toString

    it("assigns cells via a broadcast centroid array and never a corpus cross product") {
      // the only acceptable nested-loop join is the 1-row centroid
      // array attach (it appears once per reuse of the assigned
      // subtree); candidate generation must be the cell-keyed
      // EQUI-join — a CartesianProduct here is the corpus-wide
      // quadratic the cells exist to prevent
      plan should not include "CartesianProduct"
      plan should include("BroadcastNestedLoopJoin") // the 1-row attach
    }
  }
}
