package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class TextOpsSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private lazy val sig = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
    TextOps.simHash(docs, "doc_id", "t").cache()
  }

  describe("simHashPairs (pigeonhole banding)") {
    it("finds exactly the pairs the all-pairs join finds") {
      val a = sig.select(col("doc_id").as("d1"), col("simhash").as("h1"))
      val b = sig.select(col("doc_id").as("d2"), col("simhash").as("h2"))
      val allPairs = a.join(b, col("d1") < col("d2"))
        .select(col("d1"), col("d2"),
          bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long").as("hamming"))
        .filter(col("hamming") <= 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val banded = TextOps.simHashPairs(sig, "doc_id", "simhash", 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      banded shouldBe allPairs
    }

    it("generates candidates through an equi-join, not a nested-loop scan") {
      val plan = TextOps.simHashPairs(sig, "doc_id", "simhash", 6)
        .queryExecution.executedPlan.toString
      plan should not include "NestedLoop"
      plan should not include "Cartesian"
    }

    it("emits each qualifying pair exactly once") {
      val rows = TextOps.simHashPairs(sig, "doc_id", "simhash", 6)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
      rows.distinct.length shouldBe rows.length
    }

    it("matches the all-pairs reference on random signatures (pigeonhole property)") {
      val s = spark
      import s.implicits._
      val rnd = new scala.util.Random(42)
      val sigs = (0L until 300L).map(i => (i, rnd.nextLong() & ((1L << 48) - 1)))
        .toDF("doc_id", "simhash")
      val a = sigs.select(col("doc_id").as("d1"), col("simhash").as("h1"))
      val b = sigs.select(col("doc_id").as("d2"), col("simhash").as("h2"))
      (0 to 6).foreach { maxH =>
        val allPairs = a.join(b, col("d1") < col("d2"))
          .select(col("d1"), col("d2"),
            bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long").as("hamming"))
          .filter(col("hamming") <= maxH)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val banded = TextOps.simHashPairs(sigs, "doc_id", "simhash", maxH)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        withClue(s"maxHamming=$maxH: ") { banded shouldBe allPairs }
      }
    }

    it("drops degenerate buckets when capped, keeping discriminative pairs") {
      val s = spark
      import s.implicits._
      // 50 identical all-zero signatures (one degenerate bucket per
      // chunk) + two near-identical outliers that only meet in a
      // small bucket
      val near = (1L << 47) | (1L << 20) // differs from `near2` by 1 bit
      val near2 = (1L << 47) | (1L << 21)
      val sigs = ((0L until 50L).map(i => (i, 0L)) ++ Seq((100L, near), (101L, near2)))
        .toDF("doc_id", "simhash")
      val capped = TextOps.simHashPairs(sigs, "doc_id", "simhash", 6, maxBucket = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the zero-cluster's O(n²) pairs are gone...
      capped.exists(p => p._1 < 50L && p._2 < 50L) shouldBe false
      // ...but the outlier pair survives via its uncapped chunk bucket
      capped should contain((100L, 101L))
    }
  }

  describe("round-5 curation query surfaces") {
    it("dedup_chunks keeps corpus-wide kept-chunk totals consistent") {
      val out = SparkEntry.allDefs("dedup_chunks").fn(spark, sfDir).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      out should not be empty
      // every doc has chunks; no doc keeps more than it has
      out.values.foreach { case (n, first) =>
        n should be > 0L
        first should be <= n
      }
    }

    it("text_redact_pii strips emails and long digit runs") {
      val rows = SparkEntry.allDefs("text_redact_pii").fn(spark, sfDir).collect()
      rows should not be empty
      rows.foreach { r =>
        val red = r.getString(1)
        red should include("<EMAIL>")
        red should include("<NUM>")
        red should not include "@"
        r.getLong(2) shouldBe 1L // exactly the planted email per doc
      }
    }
  }

  describe("bpeMerges") {
    it("learns the classic hierarchy on a hand-traceable corpus") {
      val s = spark
      import s.implicits._
      // "abab" x2 + "cd" x1: round 1 pairs are ab(4: 2 per word x freq
      // 2), ba(2), cd(1) -> merge ab into chr(257); "abab" becomes two
      // merged symbols, so round 2's argmax is that symbol pair (2);
      // round 3 merges cd(1); round 4 finds no pair (every word is one
      // symbol) -> training stops early with 3 rows
      val docs = Seq("abab abab cd").toDF("text")
      val out = TextOps.bpeMerges(docs, "text", rounds = 6)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      out.length shouldBe 3
      out(0) shouldBe ((1L, "ab", 4L))
      out(1) shouldBe ((2L, "" + 257.toChar + 257.toChar, 2L))
      out(2) shouldBe ((3L, "cd", 1L))
    }

    it("breaks count ties by pair byte order and stops on a pairless vocab") {
      val s = spark
      import s.implicits._
      // zz and aa tie at 1 -> aa wins lexicographically
      val tied = TextOps.bpeMerges(Seq("zz aa").toDF("text"), "text", rounds = 1)
        .collect().map(r => (r.getString(1), r.getLong(2)))
      tied.toSeq shouldBe Seq(("aa", 1L))
      // single-letter words only: nothing to merge, zero rows
      TextOps.bpeMerges(Seq("a b c a").toDF("text"), "text", rounds = 3)
        .count() shouldBe 0L
    }
  }
}
