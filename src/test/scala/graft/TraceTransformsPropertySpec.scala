package graft

import graft.model.Span
import graft.trace.TraceTransforms
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Property tests: pipeline invariants over randomly-shaped traces —
  * chains, stars, forests, orphans, duplicate span ids, all kinds.
  * Generators are driven with fixed seeds (no scalatest-scalacheck
  * bridge in the offline cache) so failures reproduce exactly. */
class TraceTransformsPropertySpec extends AnyFunSpec with Matchers {

  private def forAll(f: Seq[Span] => Unit): Unit = {
    val params = Gen.Parameters.default
    (1 to 300).foreach { i =>
      genTrace(params, Seed(i.toLong)) match {
        case Some(spans) =>
          try f(spans)
          catch {
            case e: Throwable =>
              fail(s"property failed for seed=$i trace=$spans", e)
          }
        case None =>
      }
    }
  }

  private val genSpan: Gen[Int => Span] = for {
    parentIdx <- Gen.chooseNum(-2, 8) // -2: orphan parent, -1: root, else: index ref
    service <- Gen.oneOf("A", "B", "C")
    kind <- Gen.oneOf("", "client", "server")
    start <- Gen.chooseNum(0L, 10000L)
    dur <- Gen.chooseNum(0L, 5000L)
  } yield (i: Int) =>
    Span("t", s"s$i",
      parentIdx match {
        case -2 => "missing-parent"
        case -1 => ""
        case p if p < i => s"s$p"
        case _ => ""
      },
      service, "op", start, dur, kind, Map.empty)

  private val genTrace: Gen[Seq[Span]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.sequence[Seq[Int => Span], Int => Span](
      Seq.fill(n)(genSpan)).map(_.zipWithIndex.map { case (f, i) => f(i) }))

  describe("defaultPipeline invariants") {
    it("never throws and never increases the span count") {
      forAll { (spans: Seq[Span]) =>
        val out = TraceTransforms.defaultPipeline(spans)
        out.size should be <= spans.size
      }
    }

    it("is idempotent on its own output modulo span count") {
      forAll { (spans: Seq[Span]) =>
        val once = TraceTransforms.defaultPipeline(spans)
        val twice = TraceTransforms.defaultPipeline(once)
        twice.size shouldBe once.size
      }
    }

    it("dedupSpans is idempotent and order-preserving") {
      forAll { (spans: Seq[Span]) =>
        val d = TraceTransforms.dedupSpans(spans)
        TraceTransforms.dedupSpans(d) shouldBe d
        d shouldBe spans.distinct
      }
    }

    it("adjustClockSkew preserves durations and span ids") {
      forAll { (spans: Seq[Span]) =>
        val out = TraceTransforms.adjustClockSkew(TraceTransforms.dedupSpans(spans))
        out.map(s => s.spanId -> s.durationUs).toMap shouldBe
          TraceTransforms.dedupSpans(spans).map(s => s.spanId -> s.durationUs).toMap
      }
    }

    it("children end up inside their parent's interval after skew fix") {
      forAll { (spans: Seq[Span]) =>
        val in = TraceTransforms.dedupSpans(spans).groupBy(_.spanId).map(_._2.head).toSeq
        val out = TraceTransforms.adjustClockSkew(in)
        val byId = out.map(s => s.spanId -> s).toMap
        out.foreach { s =>
          byId.get(s.parentSpanId).foreach { p =>
            if (p.durationUs >= s.durationUs && p.spanId != s.spanId) {
              s.startUs should be >= p.startUs
              s.endUs should be <= p.endUs
            }
          }
        }
      }
    }

    it("sortSpans emits a permutation with roots first") {
      forAll { (spans: Seq[Span]) =>
        val out = TraceTransforms.sortSpans(spans)
        out.sortBy(_.spanId) shouldBe spans.sortBy(_.spanId)
        val rootCount = spans.count(_.parentSpanId.isEmpty)
        out.take(rootCount).forall(_.parentSpanId.isEmpty) shouldBe true
      }
    }

    it("validate flags agree with direct predicates") {
      forAll { (spans: Seq[Span]) =>
        val v = TraceTransforms.validate("t", spans)
        v.spanCount shouldBe spans.size
        v.singleRoot shouldBe (spans.count(_.parentSpanId.isEmpty) == 1)
      }
    }
  }
}
