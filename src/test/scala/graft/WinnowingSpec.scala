package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Pins the winnowing guarantees (Schleimer/Wilkerson/Aiken 2003) the
  * `text_winnowing` surface relies on: shared-substring detection,
  * rightmost tie-break, and the selection-density bounds. Exact-value
  * correctness of the surface is the DuckDB oracle's job; this spec
  * proves the ALGORITHM on hand-built documents where the expected
  * fingerprint behavior is known from the paper, not from the code.
  */
class WinnowingSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private val k = 6
  private val w = 4

  private def fps(texts: (Int, String)*) = {
    import spark.implicits._
    TextOps.winnow(texts.toDF("doc_id", "text"), "doc_id", "text", k, w)
  }

  describe("TextOps.winnow") {
    it("two docs sharing a substring of length >= k+w-1 share a fingerprint value") {
      // shared block of exactly k+w-1 = 9 chars, embedded in unrelated noise
      val shared = "qwertyuio"
      val fp = fps(
        1 -> s"zzzzzzzzzzzz${shared}xxxxxxxxxxxx",
        2 -> s"ababababab${shared}cdcdcdcdcd")
        .collect().groupBy(_.getInt(0)).map { case (d, rs) => d -> rs.map(_.getLong(2)).toSet }
      fp(1).intersect(fp(2)) should not be empty
    }

    it("selects the rightmost position on all-tie windows") {
      // one repeated char: every gram hashes identically, so each
      // window's minimum is its rightmost element -> selected positions
      // are exactly {w, w+1, ..., L} and the count is L - w + 1
      val text = "a" * 20 // L = 20 - k + 1 = 15
      val rows = fps(1 -> text).collect()
      val l = 20 - k + 1
      rows.map(_.getLong(1)).sorted shouldBe (w.toLong to l.toLong).toArray
      rows.length shouldBe l - w + 1
    }

    it("density stays within the paper's bounds on the real corpus") {
      val textLen = org.apache.spark.sql.functions.length(col("text"))
      val docs = Tables.documents(spark, sfDir).filter(textLen >= lit(k + w - 1))
      val stats = TextOps.winnow(docs, "doc_id", "text", k, w)
        .groupBy("doc_id").agg(count(lit(1)).as("nfp"))
        .join(docs.select(col("doc_id"), (textLen - (k - 1)).as("L")), "doc_id")
        .select(
          sum(when(col("nfp") > col("L") - (w - 1), 1).otherwise(0)).as("over"),
          sum(when(col("nfp") * w < col("L") - (w - 1), 1).otherwise(0)).as("under"),
          count(lit(1)).as("n"))
        .head()
      stats.getLong(2) should be > 0L
      withClue("docs selecting more than one fp per window start") {
        stats.getLong(0) shouldBe 0L
      }
      withClue("docs selecting fewer than (L-w+1)/w fps") {
        stats.getLong(1) shouldBe 0L
      }
    }

    it("dedup_winnowing recovers every planted mutated pair at sf0.001") {
      // the surface doubles the corpus under a variable-length prefix
      // mutation; each original doc_id d must pair with its copy
      // d + 10^7 despite every fingerprint position shifting
      val rows = SparkEntry.allDefs("dedup_winnowing").fn(spark, sfDir)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = Tables.documents(spark, sfDir)
        .filter(org.apache.spark.sql.functions.length(col("text")) >= lit(12))
        .select("doc_id").collect().map(_.getLong(0))
        .map(d => (d, d + 10000000L)).toSet
      withClue("planted pairs missing from the candidate set") {
        (expected -- rows) shouldBe empty
      }
    }

    it("is insensitive to where the shared block sits (position-shift invariance)") {
      // same text shifted by a prefix: fingerprint VALUES of the shared
      // suffix must overlap heavily even though positions differ
      val body = "the quick brown fox jumps over the lazy dog"
      val fp = fps(1 -> body, 2 -> s"PREFIX-123 $body")
        .collect().groupBy(_.getInt(0)).map { case (d, rs) => d -> rs.map(_.getLong(2)).toSet }
      fp(1).intersect(fp(2)).size should be >= (fp(1).size / 2)
    }
  }
}
