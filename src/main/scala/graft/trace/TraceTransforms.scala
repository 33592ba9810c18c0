package graft.trace

import graft.model.Span

import scala.annotation.tailrec
import scala.collection.mutable

/** Per-trace transformation pipeline, re-expressing the reference
  * reader's validators + transformers as pure functions
  * `Seq[Span] => Seq[Span]` over one trace's spans.
  *
  * Spark-first rationale: every step here is local to one trace, so the
  * distributed shape is a SINGLE shuffle (groupBy traceId) followed by
  * partition-local logic — see [[TraceDataset.transformTraces]]. The
  * reference runs the same logic driver-side per gRPC call
  * (reader/readers/TraceProcessor.scala:34-41); at 100 TB we run it
  * data-parallel over millions of traces.
  *
  * Reference files (semantics source, not code source):
  *  - DeDuplicateSpanTransformer.scala        → [[dedupSpans]]
  *  - ClientServerEventLogTransformer.scala   → [[deriveKinds]]
  *  - InfrastructureTagTransformer.scala      → [[propagateInfraTags]]
  *  - PartialSpanTransformer.scala + SpanMerger.scala → [[mergePartialSpans]]
  *  - ServerClientSpanMergeTransformer.scala  → [[mergeServerClientSpans]]
  *  - ClockSkewTransformer.scala              → [[adjustClockSkewFromEvents]]
  *  - ClockSkewFromParentTransformer.scala    → [[adjustClockSkew]]
  *  - InvalidRootTransformer.scala            → [[fixInvalidRoots]]
  *  - InvalidParentTransformer.scala          → [[fixInvalidParents]]
  *  - OrphanedTraceTransformer.scala          → [[fixOrphanedTrace]]
  *  - SortSpanTransformer.scala               → [[sortSpans]]
  *  - TraceReader.buildTraceCallGraph         → [[callGraph]]
  *  - validators/{TraceId,Root,ParentId}Validator.scala → [[validate]]
  */
object TraceTransforms {

  // Auxiliary tag keys (same public names as the reference's
  // reader/readers/utils/AuxiliaryTags.scala so indexed traces stay
  // queryable by users migrating from the reference).
  object Aux {
    val IsMergedSpan = "X-HAYSTACK-IS-MERGED-SPAN"
    val NetworkDelta = "X-HAYSTACK-NETWORK-DELTA"
    val ClientServiceName = "X-HAYSTACK-CLIENT-SERVICE-NAME"
    val ClientOperationName = "X-HAYSTACK-CLIENT-OPERATION-NAME"
    val ClientSpanId = "X-HAYSTACK-CLIENT-SPAN-ID"
    val ClientStartTime = "X-HAYSTACK-CLIENT-START-TIME"
    val ClientDuration = "X-HAYSTACK-CLIENT-DURATION"
    val ServerServiceName = "X-HAYSTACK-SERVER-SERVICE-NAME"
    val ServerOperationName = "X-HAYSTACK-SERVER-OPERATION-NAME"
    val ServerStartTime = "X-HAYSTACK-SERVER-START-TIME"
    val ServerDuration = "X-HAYSTACK-SERVER-DURATION"
    val ErrMultiPartialSpan = "X-HAYSTACK-ERR-IS-MULTI-PARTIAL-SPAN"
    val AutogenFlag = "X-HAYSTACK-AUTOGEN"
    val AutogenReason = "X-HAYSTACK-AUTOGEN-REASON"
    val RootCount = "X-HAYSTACK-SPAN-ROOT-COUNT"
    val AutogenOperation = "auto-generated"
    val InfraProvider = "X-HAYSTACK-INFRASTRUCTURE-PROVIDER"
    val InfraLocation = "X-HAYSTACK-AWS-REGION"
  }

  // ---------------------------------------------------------------- forest

  /** Span forest: trees linked by parentSpanId; roots are spans whose
    * parent is absent from the trace (or empty). Reference:
    * reader/readers/utils/MutableSpanForest.scala reCreateForest. */
  final case class Tree(span: Span, children: Seq[Tree])

  def buildForest(spans: Seq[Span]): Seq[Tree] = {
    val indexed = spans.zipWithIndex
    val ids = spans.map(_.spanId).toSet
    val childrenOf = indexed.groupBy(_._1.parentSpanId)
    val used = mutable.BitSet()
    // `used` consumes each physical span once; the ancestor set breaks
    // parent-id cycles (a→b→a) during descent so malformed traces can't
    // loop the builder or vanish from the forest
    def grow(s: Span, i: Int, ancestors: Set[String]): Tree = {
      used += i
      val kids = childrenOf.getOrElse(s.spanId, Nil)
        .filter { case (c, j) => !used(j) && c.spanId != s.spanId && !ancestors(c.spanId) }
      Tree(s, kids.map { case (c, j) => grow(c, j, ancestors + s.spanId) })
    }
    // a root: empty parent, self-loop, or parent not present in trace
    val roots = indexed
      .filter { case (s, _) =>
        s.parentSpanId.isEmpty || s.parentSpanId == s.spanId || !ids.contains(s.parentSpanId)
      }
      .map { case (s, i) => grow(s, i, Set.empty) }
    // spans only reachable through a cycle: elect the earliest remaining
    // span as that cycle's root until every span is in some tree
    val extra = mutable.ListBuffer[Tree]()
    var remaining = indexed.filterNot { case (_, i) => used(i) }
    while (remaining.nonEmpty) {
      val (s, i) = remaining.minBy { case (sp, ix) => (sp.startUs, sp.spanId, ix) }
      extra += grow(s, i, Set.empty)
      remaining = indexed.filterNot { case (_, j) => used(j) }
    }
    roots ++ extra.toSeq
  }

  private def flatten(t: Tree): Seq[Span] = t.span +: t.children.flatMap(flatten)

  // ------------------------------------------------------- pre-transforms

  /** Remove exactly-duplicated spans, keeping first occurrence. */
  def dedupSpans(spans: Seq[Span]): Seq[Span] = {
    val seen = mutable.HashSet[Span]()
    spans.filter(s => seen.add(s))
  }

  /** Derive the client/server kind from the span.kind tag when the kind
    * field is unset — the model-level analogue of the reference's
    * ClientServerEventLogTransformer, which backfills cs/cr/sr/ss log
    * events from the span.kind tag so downstream merge steps can
    * classify partial spans. */
  def deriveKinds(spans: Seq[Span]): Seq[Span] =
    spans.map { s =>
      if (s.kind.nonEmpty) s
      else s.tags.get("span.kind") match {
        case Some(k) if k.equalsIgnoreCase("client") || k.equalsIgnoreCase("server") =>
          s.copy(kind = k.toLowerCase)
        case _ => s
      }
    }

  /** Propagate infrastructure provider/location tags across all spans
    * of a service (reference InfrastructureTagTransformer): many
    * services send infra tags only on the server span to save transfer
    * cost; spans of the same service that carry NO infra tag inherit
    * the ones observed anywhere in the trace. Spans that already carry
    * any infra tag are left untouched, exactly like the reference.
    *
    * DELIBERATE DIVERGENCE from InfrastructureTagTransformer: the
    * reference's repeated-tag list model appends EVERY observed
    * instance of a (service, key) tag to spans lacking it, so two
    * spans of one service carrying conflicting infra values both
    * propagate; graft's map-typed tags can hold one value per key, so
    * the FIRST observation per (service, key) wins — deterministic in
    * span order, single-valued thereafter. Traces without conflicting
    * infra tags (the designed-for case) resolve identically. */
  def propagateInfraTags(spans: Seq[Span]): Seq[Span] = {
    val infraKeys = Set(Aux.InfraProvider, Aux.InfraLocation)
    val byService = mutable.HashMap[String, Map[String, String]]()
    spans.foreach { s =>
      val infra = s.tags.filter { case (k, _) => infraKeys(k) }
      if (infra.nonEmpty)
        // existing entries win (first span's value is kept)
        byService.update(s.service, infra ++ byService.getOrElse(s.service, Map.empty))
    }
    spans.map { s =>
      if (s.tags.keysIterator.exists(infraKeys)) s
      else byService.get(s.service).fold(s)(infra => s.copy(tags = s.tags ++ infra))
    }
  }

  // ------------------------------------------------------ span merging

  /** Merge client+server halves reported under the same spanId.
    * Fallbacks mirror the reference: only-server → server, only-client →
    * client, neither/many unlabeled → collapse with an error tag. */
  def mergePartialSpans(spans: Seq[Span]): Seq[Span] =
    spans.groupBy(_.spanId).valuesIterator.map {
      case Seq(one) => one
      case many => mergeSpans(many)
    }.toSeq

  def mergeSpans(spans: Seq[Span]): Span = {
    val server = collapseSpans(spans.filter(_.isServer))
    val client = collapseSpans(spans.filter(_.isClient))
    (client, server) match {
      case (Some(c), Some(s)) => merge(c, s)
      case (None, Some(s)) => s
      case (Some(c), None) => c
      case _ => collapseSpans(spans).get
    }
  }

  /** Client/server pair → one span: server span is the base, client's
    * parent id stitches it into the caller's tree, auxiliary tags keep
    * both sides' identities (reference SpanMerger.merge). */
  private def merge(client: Span, server: Span): Span = {
    val networkDelta =
      if (server.durationUs < client.durationUs) client.durationUs - server.durationUs else -1L
    server.copy(
      parentSpanId = client.parentSpanId,
      kind = "merged",
      tags = client.tags ++ server.tags ++ Map(
        Aux.IsMergedSpan -> "true",
        Aux.NetworkDelta -> networkDelta.toString,
        Aux.ClientServiceName -> client.service,
        Aux.ClientOperationName -> client.operation,
        Aux.ClientSpanId -> client.spanId,
        Aux.ClientStartTime -> client.startUs.toString,
        Aux.ClientDuration -> client.durationUs.toString,
        Aux.ServerServiceName -> server.service,
        Aux.ServerOperationName -> server.operation,
        Aux.ServerStartTime -> server.startUs.toString,
        Aux.ServerDuration -> server.durationUs.toString))
  }

  private def collapseSpans(spans: Seq[Span]): Option[Span] = spans match {
    case Nil => None
    case Seq(one) => Some(one)
    case many =>
      val first = many.minBy(_.startUs)
      val last = many.maxBy(_.endUs)
      Some(first.copy(
        operation = many.map(_.operation).mkString(" & "),
        durationUs = last.endUs - first.startUs,
        tags = many.iterator.flatMap(_.tags).toMap + (Aux.ErrMultiPartialSpan -> "true")))
  }

  /** Merge a parent client span with its single child server span from a
    * different service (reference ServerClientSpanMergeTransformer):
    * top-down collapse; a merged node adopts its grandchildren. */
  def mergeServerClientSpans(spans: Seq[Span]): Seq[Span] = {
    def alreadyMerged(s: Span) = s.tags.contains(Aux.IsMergedSpan)
    def kindOf(s: Span) = if (s.kind.nonEmpty) s.kind else ""
    def mergeableKinds(a: Span, b: Span): Boolean = {
      val (ka, kb) = (kindOf(a), kindOf(b))
      val pc = Set("producer", "consumer")
      !(ka.nonEmpty && kb.nonEmpty && ka == kb) && !pc(ka) && !pc(kb)
    }
    def shouldMerge(p: Span, c: Span) =
      c.service != p.service && !alreadyMerged(p) && !alreadyMerged(c) && mergeableKinds(p, c)

    def collapse(t: Tree): Tree = t.children match {
      case Seq(only) if shouldMerge(t.span, only.span) =>
        collapse(Tree(mergeClientParentWithServerChild(t.span, only.span), only.children))
      case kids => Tree(t.span, kids.map(collapse))
    }
    buildForest(spans).map(collapse).flatMap(flatten)
  }

  private def mergeClientParentWithServerChild(parent: Span, child: Span): Span =
    merge(
      if (parent.kind.isEmpty) parent.copy(kind = "client") else parent,
      if (child.kind.isEmpty) child.copy(kind = "server") else child)

  // ------------------------------------------------------- clock skew

  private final case class Skew(service: String, delta: Long)

  /** Event-log clock-skew correction — the reference's DEFAULT skew
    * transformer (ClockSkewTransformer, enabled in reader base.conf).
    * A merged client/server span carries both sides' event timestamps
    * in its merge aux tags: cs = client start, cr = cs + client
    * duration, sr = server start, ss = sr + server duration. Skew
    * exists when the logs are NOT in cs → sr → ss → cr order (and the
    * server interval isn't longer than the client's): the server clock
    * is off by delta = sr − (clientDur − serverDur)/2 − cs. The span
    * itself and its direct children are shifted by −delta when their
    * service matches the skewed (server) service; a child that is
    * itself a merged span computes and cascades its own skew, exactly
    * mirroring the reference's adjustSkew recursion (event logs stay
    * pristine — shifts touch only startUs). */
  def adjustClockSkewFromEvents(spans: Seq[Span]): Seq[Span] = {
    def skewOf(s: Span): Option[Skew] =
      if (!s.tags.contains(Aux.IsMergedSpan)) None
      else for {
        cs <- s.tags.get(Aux.ClientStartTime).flatMap(_.toLongOption)
        cd <- s.tags.get(Aux.ClientDuration).flatMap(_.toLongOption)
        sr <- s.tags.get(Aux.ServerStartTime).flatMap(_.toLongOption)
        sd <- s.tags.get(Aux.ServerDuration).flatMap(_.toLongOption)
        // cs → sr and ss → cr already ordered, or server longer than
        // client: timestamps are plausible, leave them alone
        if !(sd > cd || (cs < sr && cs + cd > sr + sd))
        delta = sr - (cd - sd) / 2 - cs
        if delta != 0
      } yield Skew(s.service, delta)

    def shift(s: Span, k: Skew): Span =
      if (s.service == k.service) s.copy(startUs = s.startUs - k.delta) else s

    def walk(t: Tree, prev: Option[Skew]): Seq[Span] = {
      val prevAdjusted = prev.fold(t.span)(shift(t.span, _))
      skewOf(prevAdjusted) match {
        case Some(own) =>
          shift(prevAdjusted, own) +: t.children.flatMap(walk(_, Some(own)))
        case None =>
          prevAdjusted +: t.children.flatMap(walk(_, None))
      }
    }
    buildForest(spans).flatMap(walk(_, None))
  }

  /** Shift children into the parent's interval, cascading the adjusted
    * parent downward (reference ClockSkewFromParentTransformer — the
    * alternate skew strategy for spans without event logs). */
  def adjustClockSkew(spans: Seq[Span]): Seq[Span] = {
    val out = mutable.ListBuffer[Span]()
    @tailrec
    def walk(level: Seq[(Tree, Option[Span])]): Unit =
      if (level.nonEmpty) {
        val next = mutable.ListBuffer[(Tree, Option[Span])]()
        level.foreach { case (tree, parent) =>
          val adjusted = parent match {
            case Some(p) => shiftIntoParent(tree.span, p)
            case None => tree.span
          }
          out += adjusted
          next ++= tree.children.map(c => (c, Some(adjusted)))
        }
        walk(next.toSeq)
      }
    walk(buildForest(spans).map(t => (t, Option.empty[Span])))
    out.toSeq
  }

  private def shiftIntoParent(child: Span, parent: Span): Span = {
    var shift = 0L
    if (child.startUs < parent.startUs) shift = parent.startUs - child.startUs
    if (parent.endUs < child.endUs + shift) shift = parent.endUs - child.endUs
    if (shift == 0L) child else child.copy(startUs = child.startUs + shift)
  }

  // ------------------------------------------------------- root/parent fixes

  /** Zero roots → clear a parent id (single tree, else single loopback,
    * else earliest tree root); many roots → synthesize a parent root.
    * Reference InvalidRootTransformer. */
  def fixInvalidRoots(spans: Seq[Span]): Seq[Span] = {
    if (spans.isEmpty) return spans
    val emptyParentRoots = spans.filter(_.parentSpanId.isEmpty)
    emptyParentRoots.size match {
      case 1 => spans
      case 0 =>
        val forest = buildForest(spans)
        val clear: Span => Boolean =
          if (forest.size <= 1) { _ => true }
          else {
            val loopbacks = forest.filter(t => t.span.spanId == t.span.parentSpanId)
            if (loopbacks.size == 1) { s => s == loopbacks.head.span }
            else {
              val earliest = forest.minBy(_.span.startUs).span
              s => s == earliest
            }
          }
        val rootSpans = forest.map(_.span).toSet
        spans.map(s => if (rootSpans.contains(s) && clear(s)) s.copy(parentSpanId = "") else s)
      case n =>
        val forest = buildForest(spans)
        val newRoot = autoGeneratedRoot(forest.map(_.span), "multiple root spans", spans.head.traceId + "-autogen-root")
          .copy(tags = Map(Aux.AutogenFlag -> "true", Aux.AutogenReason -> "multiple root spans", Aux.RootCount -> n.toString))
        reparentTreeRoots(spans, forest, newRoot)
    }
  }

  /** Every tree that isn't the (single) empty-parent root gets
    * re-attached under it (reference InvalidParentTransformer). Total:
    * with zero or several empty-parent roots there is no unambiguous
    * attach point, so the trace passes through unchanged instead of
    * failing the whole Spark task (the reference throws here, which is
    * acceptable per-RPC but not inside a 100 TB stage). */
  def fixInvalidParents(spans: Seq[Span]): Seq[Span] = {
    val forest = buildForest(spans)
    val rootTrees = forest.filter(_.span.parentSpanId.isEmpty)
    if (rootTrees.size != 1) spans
    else {
      val root = rootTrees.head.span
      val strayRoots = forest.filterNot(_.span == root).map(_.span).toSet
      spans.map(s => if (strayRoots.contains(s)) s.copy(parentSpanId = root.spanId) else s)
    }
  }

  /** No root at all: if every orphan tree hangs off the same missing
    * parent AND that parent id equals the traceId, synthesize the root;
    * multiple distinct orphans → drop the trace (reference
    * OrphanedTraceTransformer). */
  def fixOrphanedTrace(spans: Seq[Span]): Seq[Span] = {
    val orphanTrees = buildForest(spans).filter(_.span.parentSpanId.nonEmpty)
    if (orphanTrees.isEmpty) spans
    else {
      val parents = orphanTrees.map(_.span.parentSpanId).distinct
      val single = parents.size == 1 && parents.head == orphanTrees.head.span.traceId
      if (!single) Seq.empty
      else spans :+ autoGeneratedRoot(spans, "Missing root span", spans.head.traceId)
    }
  }

  private def autoGeneratedRoot(spans: Seq[Span], reason: String, rootSpanId: String): Span = {
    val first = spans.minBy(_.startUs)
    val last = spans.maxBy(_.endUs)
    Span(
      traceId = first.traceId,
      spanId = rootSpanId,
      parentSpanId = "",
      service = first.service,
      operation = Aux.AutogenOperation,
      startUs = first.startUs,
      durationUs = last.endUs - first.startUs,
      kind = "",
      tags = Map(Aux.AutogenFlag -> "true", Aux.AutogenReason -> reason))
  }

  private def reparentTreeRoots(spans: Seq[Span], forest: Seq[Tree], newRoot: Span): Seq[Span] = {
    val oldRoots = forest.map(_.span).toSet
    newRoot +: spans.map(s => if (oldRoots.contains(s)) s.copy(parentSpanId = newRoot.spanId) else s)
  }

  // ------------------------------------------------------------- ordering

  /** Root first, then remaining spans by start time (reference
    * SortSpanTransformer). */
  def sortSpans(spans: Seq[Span]): Seq[Span] = {
    val (roots, rest) = spans.partition(_.parentSpanId.isEmpty)
    roots ++ rest.sortBy(s => (s.startUs, s.spanId))
  }

  // ------------------------------------------------------------ call graph

  final case class CallEdge(
      fromService: String, fromOperation: String,
      toService: String, toOperation: String,
      networkDeltaUs: Long)

  /** Call edges from merged client/server spans (reference
    * TraceReader.buildTraceCallGraph). */
  def callGraph(spans: Seq[Span]): Seq[CallEdge] =
    spans.filter(_.tags.contains(Aux.IsMergedSpan)).map { s =>
      CallEdge(
        s.tags.getOrElse(Aux.ClientServiceName, ""),
        s.tags.getOrElse(Aux.ClientOperationName, ""),
        s.tags.getOrElse(Aux.ServerServiceName, ""),
        s.tags.getOrElse(Aux.ServerOperationName, ""),
        s.tags.get(Aux.NetworkDelta).map(_.toLong).getOrElse(-1L))
    }

  // ------------------------------------------------------------ validation

  final case class TraceValidation(
      traceId: String,
      spanCount: Int,
      traceIdConsistent: Boolean, // TraceIdValidator
      singleRoot: Boolean, // RootValidator
      parentsResolvable: Boolean, // ParentIdValidator
      valid: Boolean)

  def validate(traceId: String, spans: Seq[Span]): TraceValidation = {
    val ids = spans.map(_.spanId).toSet
    val consistent = spans.forall(_.traceId == traceId)
    val roots = spans.count(_.parentSpanId.isEmpty)
    val resolvable = spans.forall(s => s.parentSpanId.isEmpty || ids.contains(s.parentSpanId))
    TraceValidation(traceId, spans.size, consistent, roots == 1, resolvable,
      consistent && roots == 1 && resolvable)
  }

  // ------------------------------------------------------------ pipeline

  /** The reference's default pipeline, in base.conf order — pre:
    * dedup → client/server kind derivation → infra-tag propagation;
    * post: partial-span merge → server/client span merge → event-log
    * clock-skew fix → sort. Root/orphan repair
    * ([[fixInvalidRoots]]/[[fixInvalidParents]]/[[fixOrphanedTrace]])
    * stays opt-in, exactly as in the reference config; the from-parent
    * skew variant ([[adjustClockSkew]]) remains the alternate strategy
    * for spans that never carried event logs. */
  def defaultPipeline(spans: Seq[Span]): Seq[Span] = {
    val pre = propagateInfraTags(deriveKinds(dedupSpans(spans)))
    if (pre.isEmpty) pre
    else sortSpans(adjustClockSkewFromEvents(mergeServerClientSpans(mergePartialSpans(pre))))
  }

  /** Pipeline variant with full root/orphan repair enabled (the
    * reference's InvalidRoot/InvalidParent/Orphaned transformers).
    * fixOrphanedTrace only fires when NO root exists at all — composing
    * it with a rooted trace would delete valid traces (the reference
    * never composes them either: Orphaned is commented out of its
    * default config precisely because it assumes a rootless input). */
  def repairingPipeline(spans: Seq[Span]): Seq[Span] = {
    val pre = propagateInfraTags(deriveKinds(dedupSpans(spans)))
    if (pre.isEmpty) return Nil
    val afterOrphan =
      if (pre.exists(_.parentSpanId.isEmpty)) pre
      else fixOrphanedTrace(pre)
    afterOrphan match {
      case Nil => Nil
      case s =>
        val reparented = fixInvalidParents(fixInvalidRoots(s))
        sortSpans(adjustClockSkewFromEvents(mergeServerClientSpans(mergePartialSpans(reparented))))
    }
  }
}
