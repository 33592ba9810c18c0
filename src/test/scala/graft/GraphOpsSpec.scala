package graft

import graft.operators.GraphOps
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class GraphOpsSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private def cc(edges: (Long, Long)*): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    GraphOps.connectedComponents(edges.toSeq.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  describe("connectedComponents") {
    it("labels a chain, a clique, and a singleton pair by their min node") {
      // chain 1-2-3-4 (diameter 3, needs several propagation rounds),
      // clique {10,11,12}, pair {20,21}
      val out = cc((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      out shouldBe Map(
        1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L, 12L -> 10L,
        20L -> 20L, 21L -> 20L)
    }

    it("propagates the min across a long chain (diameter > a couple rounds)") {
      val chain = (0L until 15L).map(i => (i, i + 1))
      val out = cc(chain: _*)
      out.values.toSet shouldBe Set(0L)
      out.keySet shouldBe (0L to 15L).toSet
    }

    it("handles edge direction irrelevance and duplicate edges") {
      val out = cc((5L, 3L), (3L, 5L), (5L, 3L), (3L, 1L))
      out shouldBe Map(1L -> 1L, 3L -> 1L, 5L -> 1L)
    }
  }
}
