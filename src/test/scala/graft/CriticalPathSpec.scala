package graft

import graft.queries.TextQueries
import graft.trace.TraceDataset
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Invariant checks for the two round-7 analysis surfaces whose DuckDB
  * oracles prove end-to-end equality but not the structural claims:
  * the critical-path walk's step-by-step legality, and KL drift's
  * information-theoretic bounds.
  */
class CriticalPathSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private def runWalk(rows: Seq[(String, Long, String, Long, Long)]) = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("trace_id", "span_id", "service", "start_us", "duration_us")
    TraceDataset.criticalPathHeap(df)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .toSeq
  }

  describe("criticalPathHeap") {
    it("picks the later-ending child at each level of a hand-built trace") {
      // pos by (start, id):  1=(10,#1)  2=(20,#2)  3=(30,#3)  4=(40,#4)
      // children of 1: {2,3}; end(2)=20+5=25, end(3)=30+100=130 -> 3
      // children of 3: {6,7} absent (n=4) -> leaf? children of pos 3 are
      // 6,7 > n, so the walk stops at 3. Expect path 1 -> 3.
      val out = runWalk(Seq(
        ("t", 1L, "a", 10L, 1L),
        ("t", 2L, "b", 20L, 5L),
        ("t", 3L, "c", 30L, 100L),
        ("t", 4L, "d", 40L, 1L)))
      out.sortBy(_._2) shouldBe Seq(
        ("t", 1L, 1L, "a", 1L),
        ("t", 2L, 3L, "c", 100L))
    }

    it("breaks end-time ties toward the smaller span id") {
      // children of root: pos2=(#5,end 30), pos3=(#9,end 30) -> #5 wins
      val out = runWalk(Seq(
        ("t", 1L, "r", 0L, 1L),
        ("t", 5L, "x", 10L, 20L),
        ("t", 9L, "y", 20L, 10L)))
      out.map(_._3) shouldBe Seq(1L, 5L)
    }

    it("satisfies the walk invariants on seeded random traces") {
      val rng = new scala.util.Random(7)
      val rows = (1 to 40).flatMap { t =>
        val n = 1 + rng.nextInt(60)
        (0 until n).map { i =>
          (s"t$t", 1000L + i, s"svc${rng.nextInt(5)}",
            rng.nextInt(1000).toLong, 1L + rng.nextInt(500))
        }
      }
      val byTrace = rows.groupBy(_._1)
      val out = runWalk(rows).groupBy(_._1)

      out.keySet shouldBe byTrace.keySet
      for ((tid, path0) <- out) {
        val path = path0.sortBy(_._2)
        // heap positions re-derived independently of the operator
        val ordered = byTrace(tid).sortBy(r => (r._4, r._2))
        val posOf = ordered.zipWithIndex.map { case (r, i) => r._2 -> (i + 1) }.toMap
        val byPos = ordered.zipWithIndex.map { case (r, i) => (i + 1) -> r }.toMap
        val n = ordered.length

        path.map(_._2) shouldBe (1L to path.length.toLong) // contiguous steps
        posOf(path.head._3) shouldBe 1 // starts at the root slot

        val positions = path.map(p => posOf(p._3))
        positions.sliding(2).foreach {
          case Seq(p, c) =>
            Seq(2 * p, 2 * p + 1) should contain(c) // legal heap edge
            // the chosen child dominates its sibling on (end, -id)
            val sib = (2 * p) + (2 * p + 1) - c
            if (sib <= n) {
              val cr = byPos(c); val sr = byPos(sib)
              val cKey = (cr._4 + cr._5, -cr._2)
              val sKey = (sr._4 + sr._5, -sr._2)
              Ordering[(Long, Long)].gteq(cKey, sKey) shouldBe true
            }
          case _ => ()
        }
        (2 * positions.last > n) shouldBe true // ends at a leaf slot
      }
    }
  }

  describe("corpusDrift") {
    it("is exactly zero when the parity halves are identical") {
      val s = spark
      import s.implicits._
      val docs = Seq(
        (0L, "a b", "xx"), (1L, "a b", "xx"),
        (2L, "c", "xx"), (3L, "c", "xx"))
        .toDF("doc_id", "text", "lang")
      val out = TextQueries.corpusDrift(docs).collect()
      out.length shouldBe 1
      out.head.getDouble(2) shouldBe 0.0
    }

    it("is non-negative on skewed halves (Gibbs' inequality)") {
      val s = spark
      import s.implicits._
      val rng = new scala.util.Random(13)
      val docs = (0L until 60L).map { i =>
        val words = (0 until 5 + rng.nextInt(20))
          .map(_ => s"w${rng.nextInt(30)}").mkString(" ")
        (i, words, if (i % 3 == 0) "aa" else "bb")
      }.toDF("doc_id", "text", "lang")
      val out = TextQueries.corpusDrift(docs).collect()
      out.length should be > 0
      out.foreach(r => r.getDouble(2) should be >= 0.0)
    }
  }
}
