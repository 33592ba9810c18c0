package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Semantic invariants of the two round-8 session-4 surfaces, beyond
  * the QueriesSpec row smoke and the DuckDB hash gate:
  *
  *  - `dedup_incremental` must RECOVER every planted probe: each new
  *    doc is a prefix-mutated copy of an old one (id − 10M), so its
  *    best containment match must be exactly its origin — position
  *    shift alone may not defeat value-overlap matching.
  *  - `trace_graph_diff` must agree with `trace_service_graph` on the
  *    edge set and total call counts (calls_a + calls_b == calls), and
  *    every status must be one of kept/new/removed with the count
  *    zero/non-zero pattern the label claims.
  */
class IncrementalDedupSpec extends AnyFunSpec with Matchers with SparkTestBase {

  describe("dedup_incremental") {
    it("matches every planted probe back to its origin doc") {
      val rows = SparkEntry.queries("dedup_incremental")(spark, sfDir)
        .select("new_id", "old_id", "containment").collect()
      // NO probe may be lost: one output row per planted mutation
      // (the filter drops sub-0.5 containment, so presence == recall)
      val docs = Tables.documents(spark, sfDir)
      val planted = docs.filter(col("doc_id") % 10 === 0).count()
      rows.length.toLong shouldBe planted
      // The matched old doc must be at least as good as the planted
      // origin (new_id − 10M). NOT `old_id == origin`: the corpus has
      // its own template near-dups, so an earlier doc can TIE the
      // origin's overlap and win the min-id tie-break — the argmax
      // contract, not origin identity, is the invariant.
      val (oldFp, stop) = graft.queries.TextQueries.incrementalIndex(docs)
      val ovMap = graft.queries.TextQueries
        .incrementalOverlaps(oldFp, stop, graft.queries.TextQueries.mutatedTenth(docs))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      rows.foreach { r =>
        val (newId, oldId) = (r.getLong(0), r.getLong(1))
        val originOverlap = ovMap.getOrElse((newId, newId - 10000000L), 0L)
        val matchedOverlap = ovMap((newId, oldId))
        matchedOverlap should be >= originOverlap
        // equal overlap → the min-id rule must be why origin lost
        if (oldId != newId - 10000000L && matchedOverlap == originOverlap)
          oldId should be < (newId - 10000000L)
      }
    }
  }

  describe("trace_graph_diff") {
    it("is consistent with trace_service_graph edge totals") {
      val diff = SparkEntry.queries("trace_graph_diff")(spark, sfDir)
        .select(col("from_service"), col("to_service"),
          (col("calls_a") + col("calls_b")).as("calls"), col("status"),
          col("calls_a"), col("calls_b"))
        .collect()
      val graph = SparkEntry.queries("trace_service_graph")(spark, sfDir)
        .select("from_service", "to_service", "calls").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      diff.length shouldBe graph.size
      diff.foreach { r =>
        val key = (r.getString(0), r.getString(1))
        r.getLong(2) shouldBe graph(key)
        (r.getString(3), r.getLong(4) == 0L, r.getLong(5) == 0L) match {
          case ("new", a0, _)     => a0 shouldBe true
          case ("removed", _, b0) => b0 shouldBe true
          case ("kept", a0, b0)   => a0 shouldBe false; b0 shouldBe false
          case (other, _, _)      => fail(s"unknown status $other")
        }
      }
    }
  }
}
