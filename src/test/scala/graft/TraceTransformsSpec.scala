package graft

import graft.model.Span
import graft.trace.TraceTransforms
import graft.trace.TraceTransforms._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Oracle specs for the per-trace tree logic — scenarios mirror the
  * reference's reader transformer unit-test semantics. */
class TraceTransformsSpec extends AnyFunSpec with Matchers {

  private def span(
      id: String, parent: String, start: Long = 1000L, dur: Long = 100L,
      service: String = "svc", operation: String = "op", kind: String = "",
      tags: Map[String, String] = Map.empty): Span =
    Span("t1", id, parent, service, operation, start, dur, kind, tags)

  private def flattenTree(t: Tree): Seq[Span] = t.span +: t.children.flatMap(flattenTree)

  describe("dedupSpans") {
    it("removes exact duplicates keeping first occurrence") {
      val a = span("a", "")
      val b = span("b", "a")
      dedupSpans(Seq(a, b, a, b, a)) shouldBe Seq(a, b)
    }
    it("keeps spans that differ in any field") {
      val a = span("a", "")
      val a2 = a.copy(startUs = 2000L)
      dedupSpans(Seq(a, a2)) should have size 2
    }
  }

  describe("buildForest") {
    it("builds a single tree from a rooted trace") {
      val forest = buildForest(Seq(span("r", ""), span("c1", "r"), span("c2", "r"), span("g1", "c1")))
      forest should have size 1
      forest.head.span.spanId shouldBe "r"
      forest.head.children.map(_.span.spanId).toSet shouldBe Set("c1", "c2")
    }
    it("treats unresolved parents as tree roots") {
      val forest = buildForest(Seq(span("a", "missing"), span("b", "a")))
      forest should have size 1
      forest.head.span.spanId shouldBe "a"
    }
  }

  describe("mergePartialSpans") {
    it("merges a client/server pair under one spanId") {
      val client = span("x", "p0", start = 1000, dur = 200, service = "caller", kind = "client")
      val server = span("x", "other", start = 1050, dur = 100, service = "callee", kind = "server")
      val merged = mergePartialSpans(Seq(client, server))
      merged should have size 1
      val m = merged.head
      m.service shouldBe "callee" // server span is the base
      m.parentSpanId shouldBe "p0" // stitched into client's tree
      m.tags(Aux.IsMergedSpan) shouldBe "true"
      m.tags(Aux.NetworkDelta) shouldBe "100" // 200 - 100
      m.tags(Aux.ClientServiceName) shouldBe "caller"
      m.tags(Aux.ServerServiceName) shouldBe "callee"
    }
    it("network delta is -1 when server duration >= client duration") {
      val client = span("x", "p0", dur = 100, kind = "client")
      val server = span("x", "q0", dur = 150, kind = "server")
      mergePartialSpans(Seq(client, server)).head.tags(Aux.NetworkDelta) shouldBe "-1"
    }
    it("falls back to the lone server span when client is absent") {
      val s1 = span("x", "p", kind = "server")
      val s2 = span("x", "p", kind = "server", start = 2000)
      val m = mergePartialSpans(Seq(s1, s2))
      m should have size 1
      // two server halves collapse into one with the error marker
      m.head.tags(Aux.ErrMultiPartialSpan) shouldBe "true"
    }
    it("collapses unlabeled duplicates spanning first start to last end") {
      val a = span("x", "p", start = 1000, dur = 100, operation = "opA")
      val b = span("x", "p", start = 1300, dur = 200, operation = "opB")
      val m = mergePartialSpans(Seq(a, b)).head
      m.startUs shouldBe 1000
      m.durationUs shouldBe 500 // 1500 end - 1000 start
      m.operation shouldBe "opA & opB"
      m.tags(Aux.ErrMultiPartialSpan) shouldBe "true"
    }
  }

  describe("adjustClockSkewFromEvents") {
    // scenarios mirror the reference ClockSkewTransformerSpec timelines
    val T = 150000000000L

    it("does not touch a trace without merged spans") {
      // a -> b(-50) -> e(-100); a -> c(+500); a -> d(-100)
      val spans = Seq(
        span("a", "", start = T, dur = 1000),
        span("b", "a", start = T - 50, dur = 100),
        span("c", "a", start = T + 500, dur = 100),
        span("d", "a", start = T - 100, dur = 100),
        span("e", "b", start = T - 150, dur = 100))
      val out = adjustClockSkewFromEvents(spans)
      out.map(s => s.spanId -> s.startUs).toMap shouldBe
        spans.map(s => s.spanId -> s.startUs).toMap
    }

    it("shifts a skewed merged span and its same-service children by the event-log delta") {
      // cs=T cr=T+1000 sr=T+2000 ss=T+2400 → latency=(1000-400)/2=300,
      // delta = sr - latency - cs = 1700
      val merged = span("m", "", start = T + 2000, dur = 1000, service = "S",
        kind = "merged", tags = Map(
          Aux.IsMergedSpan -> "true",
          Aux.ClientStartTime -> T.toString,
          Aux.ClientDuration -> "1000",
          Aux.ServerStartTime -> (T + 2000).toString,
          Aux.ServerDuration -> "400"))
      val a = span("a", "m", start = T + 2500, dur = 400, service = "S")
      val b = span("b", "m", start = T + 2700, dur = 400, service = "S")
      val c = span("c", "b", start = T + 100, dur = 400, service = "other")
      val out = adjustClockSkewFromEvents(Seq(a, b, c, merged))
        .map(s => s.spanId -> s.startUs).toMap
      out("m") shouldBe T + 300 // 2000 - 1700
      out("a") shouldBe T + 800 // direct child, same service
      out("b") shouldBe T + 1000
      out("c") shouldBe T + 100 // grandchild below a non-merged span: untouched
    }

    it("leaves plausible timelines alone (cs→sr→ss→cr ordered)") {
      val merged = span("m", "", start = T + 100, dur = 1000, service = "S",
        kind = "merged", tags = Map(
          Aux.IsMergedSpan -> "true",
          Aux.ClientStartTime -> T.toString,
          Aux.ClientDuration -> "1000",
          Aux.ServerStartTime -> (T + 100).toString,
          Aux.ServerDuration -> "400"))
      adjustClockSkewFromEvents(Seq(merged)).head.startUs shouldBe T + 100
    }

    it("leaves the span alone when the server interval exceeds the client's") {
      val merged = span("m", "", start = T + 2000, dur = 1000, service = "S",
        kind = "merged", tags = Map(
          Aux.IsMergedSpan -> "true",
          Aux.ClientStartTime -> T.toString,
          Aux.ClientDuration -> "400",
          Aux.ServerStartTime -> (T + 2000).toString,
          Aux.ServerDuration -> "1000"))
      adjustClockSkewFromEvents(Seq(merged)).head.startUs shouldBe T + 2000
    }

    it("shifts only spans of the skewed service") {
      val merged = span("m", "", start = T + 2000, dur = 1000, service = "S",
        kind = "merged", tags = Map(
          Aux.IsMergedSpan -> "true",
          Aux.ClientStartTime -> T.toString,
          Aux.ClientDuration -> "1000",
          Aux.ServerStartTime -> (T + 2000).toString,
          Aux.ServerDuration -> "400"))
      val other = span("x", "m", start = T + 2500, dur = 100, service = "other")
      val out = adjustClockSkewFromEvents(Seq(merged, other))
        .map(s => s.spanId -> s.startUs).toMap
      out("x") shouldBe T + 2500
    }
  }

  describe("propagateInfraTags") {
    val infra = Map(
      Aux.InfraProvider -> "aws",
      Aux.InfraLocation -> "us-west-2")

    it("fills infra tags onto same-service spans that lack them") {
      val server = span("s", "", service = "A", kind = "server", tags = infra)
      val client = span("c", "s", service = "A", kind = "client")
      val foreign = span("f", "s", service = "B")
      val out = propagateInfraTags(Seq(server, client, foreign))
        .map(s => s.spanId -> s.tags).toMap
      out("c")(Aux.InfraProvider) shouldBe "aws"
      out("c")(Aux.InfraLocation) shouldBe "us-west-2"
      out("f") should not contain key(Aux.InfraProvider)
    }

    it("never overwrites a span that already carries any infra tag") {
      val server = span("s", "", service = "A", tags = infra)
      val partial = span("p", "s", service = "A",
        tags = Map(Aux.InfraProvider -> "gcp"))
      val out = propagateInfraTags(Seq(server, partial))
        .map(s => s.spanId -> s.tags).toMap
      out("p")(Aux.InfraProvider) shouldBe "gcp"
      out("p") should not contain key(Aux.InfraLocation)
    }

    it("is deterministic when two spans disagree: first span order wins") {
      val s1 = span("s1", "", service = "A", tags = Map(Aux.InfraProvider -> "aws"))
      val s2 = span("s2", "", service = "A", tags = Map(Aux.InfraProvider -> "gcp"))
      val bare = span("b", "s1", service = "A")
      val out = propagateInfraTags(Seq(s1, s2, bare))
        .map(s => s.spanId -> s.tags).toMap
      out("b")(Aux.InfraProvider) shouldBe "aws"
    }
  }

  describe("adjustClockSkew") {
    it("shifts a child starting before its parent") {
      val parent = span("p", "", start = 1000, dur = 500)
      val child = span("c", "p", start = 900, dur = 200)
      val fixed = adjustClockSkew(Seq(parent, child))
      fixed.find(_.spanId == "c").get.startUs shouldBe 1000
    }
    it("shifts a child ending after its parent") {
      val parent = span("p", "", start = 1000, dur = 500) // ends 1500
      val child = span("c", "p", start = 1400, dur = 300) // ends 1700
      val fixed = adjustClockSkew(Seq(parent, child))
      fixed.find(_.spanId == "c").get.startUs shouldBe 1200 // end pinned to 1500
    }
    it("cascades the adjusted parent to grandchildren") {
      val root = span("r", "", start = 1000, dur = 1000)
      val mid = span("m", "r", start = 500, dur = 100) // shifted to 1000
      val leaf = span("l", "m", start = 450, dur = 50) // then into mid's new window
      val fixed = adjustClockSkew(Seq(root, mid, leaf))
      fixed.find(_.spanId == "m").get.startUs shouldBe 1000
      fixed.find(_.spanId == "l").get.startUs shouldBe 1000
    }
    it("leaves well-nested spans untouched") {
      val spans = Seq(span("p", "", start = 1000, dur = 500), span("c", "p", start = 1100, dur = 100))
      adjustClockSkew(spans).toSet shouldBe spans.toSet
    }
  }

  describe("fixInvalidRoots") {
    it("passes through a single-rooted trace") {
      val spans = Seq(span("r", ""), span("c", "r"))
      fixInvalidRoots(spans) shouldBe spans
    }
    it("clears the parent id when a lone tree has no empty-parent root") {
      val spans = Seq(span("a", "missing"), span("b", "a"))
      val fixed = fixInvalidRoots(spans)
      fixed.find(_.spanId == "a").get.parentSpanId shouldBe ""
    }
    it("prefers the single loopback root") {
      val spans = Seq(span("a", "a"), span("b", "zz"), span("c", "b"))
      val fixed = fixInvalidRoots(spans)
      fixed.find(_.spanId == "a").get.parentSpanId shouldBe ""
      fixed.find(_.spanId == "b").get.parentSpanId shouldBe "zz"
    }
    it("elects the earliest tree root otherwise") {
      val spans = Seq(span("a", "m1", start = 2000), span("b", "m2", start = 1000))
      val fixed = fixInvalidRoots(spans)
      fixed.find(_.spanId == "b").get.parentSpanId shouldBe ""
      fixed.find(_.spanId == "a").get.parentSpanId shouldBe "m1"
    }
    it("synthesizes a root above multiple empty-parent roots") {
      val spans = Seq(span("a", "", start = 1000, dur = 100), span("b", "", start = 1200, dur = 300))
      val fixed = fixInvalidRoots(spans)
      fixed should have size 3
      val root = fixed.find(_.parentSpanId.isEmpty).get
      root.operation shouldBe Aux.AutogenOperation
      root.startUs shouldBe 1000
      root.durationUs shouldBe 500 // 1500 - 1000
      root.tags(Aux.RootCount) shouldBe "2"
      fixed.filter(_.spanId != root.spanId).forall(_.parentSpanId == root.spanId) shouldBe true
    }
  }

  describe("fixInvalidParents") {
    it("reattaches stray trees under the root") {
      val spans = Seq(span("r", ""), span("c", "r"), span("stray", "missing"))
      val fixed = fixInvalidParents(spans)
      fixed.find(_.spanId == "stray").get.parentSpanId shouldBe "r"
    }
    it("passes through unchanged when there is no unambiguous root") {
      val spans = Seq(span("a", ""), span("b", ""))
      fixInvalidParents(spans) shouldBe spans
    }
    it("survives a parent-id cycle without dropping spans") {
      val spans = Seq(span("a", "b"), span("b", "a"), span("c", "a"))
      val forest = buildForest(spans)
      forest.flatMap(flattenTree).size shouldBe 3
      defaultPipeline(spans).size shouldBe 3
    }
  }

  describe("fixOrphanedTrace") {
    it("is a no-op for rooted traces") {
      val spans = Seq(span("r", ""), span("c", "r"))
      fixOrphanedTrace(spans) shouldBe spans
    }
    it("synthesizes the missing root when orphans point at the traceId") {
      val spans = Seq(span("a", "t1", start = 1000, dur = 100), span("b", "t1", start = 1100, dur = 100))
      val fixed = fixOrphanedTrace(spans)
      fixed should have size 3
      val root = fixed.find(_.parentSpanId.isEmpty).get
      root.spanId shouldBe "t1"
      root.tags(Aux.AutogenReason) shouldBe "Missing root span"
    }
    it("drops the trace when orphans disagree on their parent") {
      fixOrphanedTrace(Seq(span("a", "p1"), span("b", "p2"))) shouldBe empty
    }
    it("repairingPipeline keeps a rooted trace that also has an orphan branch") {
      val spans = Seq(span("r", ""), span("c", "r"), span("stray", "missing"))
      val out = repairingPipeline(spans)
      out.map(_.spanId).toSet shouldBe Set("r", "c", "stray")
      // the orphan got reattached under the root, not deleted
      out.find(_.spanId == "stray").get.parentSpanId shouldBe "r"
    }
  }

  describe("sortSpans") {
    it("puts the root first then orders by start time") {
      val spans = Seq(span("c2", "r", start = 3000), span("r", "", start = 1500), span("c1", "r", start = 2000))
      sortSpans(spans).map(_.spanId) shouldBe Seq("r", "c1", "c2")
    }
  }

  describe("mergeServerClientSpans") {
    it("collapses a cross-service parent/child hop into one merged span") {
      val root = span("r", "", service = "A", start = 1000, dur = 500)
      val hop = span("h", "r", service = "B", start = 1100, dur = 200)
      val leaf = span("l", "h", service = "B", start = 1150, dur = 50)
      val merged = mergeServerClientSpans(Seq(root, hop, leaf))
      // root(A)->hop(B) merges; leaf reparents under the merged span
      merged should have size 2
      val m = merged.find(_.tags.contains(Aux.IsMergedSpan)).get
      m.tags(Aux.ClientServiceName) shouldBe "A"
      m.tags(Aux.ServerServiceName) shouldBe "B"
    }
    it("does not merge same-service hops") {
      val spans = Seq(span("r", "", service = "A"), span("h", "r", service = "A"))
      mergeServerClientSpans(spans).toSet shouldBe spans.toSet
    }
    it("does not merge producer/consumer kinds") {
      val spans = Seq(
        span("r", "", service = "A", kind = "producer"),
        span("h", "r", service = "B", kind = "consumer"))
      mergeServerClientSpans(spans).toSet shouldBe spans.toSet
    }
  }

  describe("callGraph") {
    it("emits edges for merged spans only") {
      val root = span("r", "", service = "A", start = 1000, dur = 500, kind = "client")
      val hop = span("r2", "r", service = "B", start = 1100, dur = 200, kind = "server")
      val processed = mergeServerClientSpans(Seq(root, hop))
      val edges = callGraph(processed)
      edges should have size 1
      edges.head.fromService shouldBe "A"
      edges.head.toService shouldBe "B"
    }
  }

  describe("validate") {
    it("accepts a consistent single-rooted resolvable trace") {
      val v = TraceTransforms.validate("t1", Seq(span("r", ""), span("c", "r")))
      v.valid shouldBe true
    }
    it("flags multiple roots") {
      TraceTransforms.validate("t1", Seq(span("a", ""), span("b", ""))).singleRoot shouldBe false
    }
    it("flags unresolvable parents") {
      TraceTransforms.validate("t1", Seq(span("r", ""), span("c", "zz"))).parentsResolvable shouldBe false
    }
    it("flags foreign trace ids") {
      val foreign = span("x", "r").copy(traceId = "OTHER")
      TraceTransforms.validate("t1", Seq(span("r", ""), foreign)).traceIdConsistent shouldBe false
    }
  }

  describe("defaultPipeline") {
    it("runs the full reference read path end to end") {
      val client = span("x", "r", start = 1000, dur = 300, service = "A", kind = "client")
      val server = span("x", "q", start = 950, dur = 200, service = "B", kind = "server")
      val root = span("r", "", start = 900, dur = 600, service = "A")
      val out = defaultPipeline(Seq(root, client, server, client))
      out.head.parentSpanId shouldBe "" // sorted: root first
      out should have size 2 // dup client removed, partials merged
      val m = out.find(_.tags.contains(Aux.IsMergedSpan)).get
      m.startUs should be >= 900L // skew-corrected into root's window
    }
  }
}
