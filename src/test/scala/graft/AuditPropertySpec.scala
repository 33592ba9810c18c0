package graft

import graft.operators.MultimodalOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Property coverage for the round-9 pure kernels: VAD segmentation vs
  * a reference run-counter over random activity patterns, the
  * pattern-PNG codec round-trip against its closed form, and URL
  * canonicalization idempotence/invariants over generated messy URLs.
  * Generators run on fixed seeds (the TraceTransformsPropertySpec
  * discipline) so failures reproduce. */
class AuditPropertySpec extends AnyFunSpec with Matchers with SparkTestBase {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  describe("vadStats segmentation") {
    val pattern: Gen[List[Boolean]] =
      Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, Gen.oneOf(true, false)))

    it("matches a reference run counter over random activity patterns") {
      import spark.implicits._
      val frameLen = 4
      val pats = samples(pattern, 60)
      val rows = pats.zipWithIndex.map { case (p, i) =>
        val sams = p.flatMap { active =>
          List.fill(frameLen)(if (active) 20000.toShort else 3.toShort)
        }.toArray
        (i.toLong, MultimodalOps.renderWav(16000, sams))
      }
      val got = MultimodalOps.vadStats(
          rows.toDF("media_id", "payload"), frameLen, 1000000L)
        .collect().map(r => r.getLong(0) -> r).toMap
      pats.zipWithIndex.foreach { case (p, i) =>
        val runs = p.foldLeft(List.empty[(Boolean, Int)]) {
          case ((a, n) :: t, v) if a == v => (a, n + 1) :: t
          case (acc, v) => (v, 1) :: acc
        }.filter(_._1).map(_._2)
        val r = got(i.toLong)
        r.getAs[Long]("n_frames") shouldBe p.length.toLong
        r.getAs[Long]("active_frames") shouldBe p.count(identity).toLong
        r.getAs[Long]("n_segments") shouldBe runs.length.toLong
        r.getAs[Long]("longest_run") shouldBe
          (if (runs.isEmpty) 0L else runs.max.toLong)
      }
    }
  }

  describe("renderPatternPng round-trip") {
    it("decodes to the closed-form grid for random seeds and brightness") {
      val cases = samples(
        for {
          seed <- Gen.chooseNum(0L, 100000L)
          br <- Gen.chooseNum(0, 5)
        } yield (seed, br), 40)
      cases.foreach { case (seed, br) =>
        val img = MultimodalOps.decodeImage(
          MultimodalOps.renderPatternPng(seed, br)).get
        for (y <- 0 until 8; x <- 0 until 9) {
          val k = (seed * 31 + x * 17 + y * 29) % 199
          val expected = (k * k % 199 % 128 + br * 5).toInt
          (img.getRGB(x, y) & 0xff) shouldBe expected
        }
      }
    }
  }

  describe("URL canonicalization") {
    import spark.implicits._

    val messy: Gen[String] = for {
      scheme <- Gen.oneOf("https", "HTTPS", "Https")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("src1", "SRC2", "alpha-Beta")
      port <- Gen.oneOf("", ":443")
      path <- Gen.chooseNum(0, 9999).map(n => s"/doc/$n")
      slash <- Gen.oneOf("", "/")
      query <- Gen.oneOf("", "?utm_source=feed", "?ref=home",
        "?utm_source=a&utm_campaign=b")
      frag <- Gen.oneOf("", "#top", "#section-2")
    } yield s"$scheme://$www$host.example.com$port$path$slash$query$frag"

    it("is idempotent and strips exactly the noise classes") {
      val urls = samples(messy, 120).distinct
      val once = urls.toDF("u")
        .select(queries.TextQueries.canonicalizeUrl(col("u")).as("c"))
        .as[String].collect()
      val twice = once.toSeq.toDF("u")
        .select(queries.TextQueries.canonicalizeUrl(col("u")).as("c"))
        .as[String].collect()
      twice.toSeq shouldBe once.toSeq
      once.foreach { c =>
        c shouldBe c.toLowerCase
        c should not include "#"
        c should not include "utm_"
        c should not include ":443"
        c should not include "www."
        c should not endWith "/"
      }
      // non-tracking params survive
      val withRef = Seq("https://a.example.com/x?ref=home").toDF("u")
        .select(queries.TextQueries.canonicalizeUrl(col("u")).as("c"))
        .as[String].head()
      withRef shouldBe "https://a.example.com/x?ref=home"
    }
  }
}
