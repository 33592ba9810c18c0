package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Pins the native `winnow_fps` expression row-identical to the
  * declarative [[TextOps.winnow]] build — the equality that lets the
  * `text_winnowing` surface run the scan-stage path while the DuckDB
  * oracle mirrors the declarative definition.
  */
class WinnowNativeSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private def both(df: org.apache.spark.sql.DataFrame, k: Int, w: Int) = {
    val d = TextOps.winnow(df, "doc_id", "text", k, w)
      .select("doc_id", "selpos", "fp").collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val n = TextOps.winnowNative(df, "doc_id", "text", k, w)
      .select("doc_id", "selpos", "fp").collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    (d, n)
  }

  describe("winnow_fps vs declarative winnow") {
    it("agrees on adversarial hand-built docs (ties, repeats, short texts, unicode)") {
      import spark.implicits._
      val docs = Seq(
        1 -> ("a" * 30),                         // all-tie windows
        2 -> "the quick brown fox jumps over the lazy dog",
        3 -> "abcabcabcabcabcabc",               // period-3 repeats
        4 -> "short",                            // below k+w-1: both emit nothing
        5 -> "exactly9!",                        // exactly k+w-1 chars: one window
        6 -> "naïve café — résumé ünïcødé text", // multi-byte codepoints
        7 -> "  leading and trailing spaces  ",
        8 -> "")
        .toDF("doc_id", "text")
      val (d, n) = both(docs, 6, 4)
      n shouldBe d
      d.map(_._1) should contain allOf (1, 2, 3, 5, 6, 7)
      d.map(_._1) should contain noneOf (4, 8)
    }

    it("agrees on the real corpus at sf0.001 for (k=6,w=4) and (k=4,w=5)") {
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id").cast("int").as("doc_id"), col("text"))
      for ((k, w) <- Seq((6, 4), (4, 5))) {
        val (d, n) = both(docs, k, w)
        withClue(s"(k=$k,w=$w)") {
          n.size shouldBe d.size
          n shouldBe d
        }
      }
    }

    it("keeps whole-stage codegen intact around the expression") {
      val docs = Tables.documents(spark, sfDir)
      val plan = TextOps.winnowNative(docs, "doc_id", "text")
        .queryExecution.executedPlan.toString
      // '*(n)' prefixes mark whole-stage-codegen stages in the short
      // plan form; the Generate and the decode Project must carry one
      plan should include("*(1) Project")
      plan should include("*(1) Generate explode(winnow_fps")
    }
  }
}
