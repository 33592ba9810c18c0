package graft

import graft.operators.TextOps
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Pins [[TextOps.suffixArrayRanks]] (prefix doubling) against the
  * definitional suffix array — sort the suffixes — on hand-built and
  * seeded-random strings, including the repetition-heavy shapes where
  * naive rank assignment goes wrong (many long shared prefixes). */
class SuffixArraySpec extends AnyFunSpec with Matchers with SparkTestBase {

  private def bruteRanks(s: String): Map[Long, Long] =
    s.indices.sortBy(i => s.substring(i)).zipWithIndex
      .map { case (pos, r) => pos.toLong -> (r + 1L) }.toMap

  private def doublingRanks(s: String): Map[Long, Long] = {
    import spark.implicits._
    val df = Seq(s).toDF("txt")
    TextOps.suffixArrayRanks(df, "txt")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  describe("suffixArrayRanks") {
    it("matches the sorted-suffix definition on banana") {
      doublingRanks("banana") shouldBe bruteRanks("banana")
    }

    it("fails LOUDLY on non-ASCII input (the base-128 seed contract, r11 advice)") {
      // ascii() yields full codepoints; é (233) would carry into the
      // next base-128 digit and silently corrupt the seed order — the
      // guard must turn that into a failure, not a wrong answer
      val e = intercept[IllegalArgumentException] { doublingRanks("café banana") }
      e.getMessage should include("codepoints outside")
      // control bytes below 0x01 are equally out of contract
      intercept[IllegalArgumentException] { doublingRanks("a\u0000b") }
    }

    it("handles a highly repetitive string (long shared prefixes)") {
      val s = "abab" * 16 + "b"
      doublingRanks(s) shouldBe bruteRanks(s)
    }

    it("handles a single repeated character") {
      val s = "a" * 23
      doublingRanks(s) shouldBe bruteRanks(s)
    }

    it("matches on seeded random strings over a tiny alphabet") {
      val rnd = new scala.util.Random(42)
      for (len <- Seq(17, 64, 200)) {
        val s = (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        withClue(s"len=$len: ") { doublingRanks(s) shouldBe bruteRanks(s) }
      }
    }

    it("matches on a spaced multi-word string (the demo-corpus shape)") {
      val s = "the quick brown fox jumps over the lazy dog the quick fox"
      doublingRanks(s) shouldBe bruteRanks(s)
    }
  }
}
