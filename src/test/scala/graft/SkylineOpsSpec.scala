package graft

import graft.operators.SkylineOps
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class SkylineOpsSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private def sky(points: (Long, Double, Long)*): Set[Long] = {
    val s = spark
    import s.implicits._
    // many partitions on purpose: the local-sweep phase must be a
    // correct superset regardless of how rows land
    val df = points.toSeq.toDF("k", "mn", "mx").repartition(5)
    SkylineOps.skyline2d(df, "k", "mn", "mx")
      .collect().map(_.getLong(0)).toSet
  }

  describe("skyline2d") {
    it("keeps exactly the non-dominated frontier") {
      // (price, size): 1 (1.0, 5) and 3 (2.0, 9) frontier;
      // 2 (1.5, 4) dominated by 1; 4 (2.5, 9) dominated by 3
      sky((1L, 1.0, 5L), (2L, 1.5, 4L), (3L, 2.0, 9L), (4L, 2.5, 9L)) shouldBe Set(1L, 3L)
    }

    it("keeps both-dim exact ties, drops single-dim ties") {
      // 1 and 2 identical -> both survive; 3 same price smaller size -> dominated;
      // 4 same size higher price -> dominated
      sky((1L, 1.0, 5L), (2L, 1.0, 5L), (3L, 1.0, 4L), (4L, 2.0, 5L)) shouldBe Set(1L, 2L)
    }

    it("matches the dominance definition on a seeded random cloud") {
      val rnd = new scala.util.Random(42)
      val pts = (0L until 500L).map(i =>
        (i, (rnd.nextInt(50) / 10.0), rnd.nextInt(40).toLong))
      val expected = pts.filter { case (_, mn, mx) =>
        !pts.exists { case (_, qn, qx) =>
          qn <= mn && qx >= mx && (qn < mn || qx > mx)
        }
      }.map(_._1).toSet
      sky(pts: _*) shouldBe expected
    }
  }
}
