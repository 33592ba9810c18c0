package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed tree algorithms over the span parent-edge relation.
  *
  * The reference materializes each trace's span tree on one node
  * (reader TraceReader.buildTree / transformers walking parent links);
  * that caps trace size at single-process memory. Here ancestor
  * traversal is pointer doubling (a.k.a. pointer jumping): every span
  * carries a cursor `(anc, dist)` — a known ancestor and the hop count
  * to it — and each round replaces the cursor with the *ancestor's*
  * cursor, doubling the distance covered. Depth-D trees finish in
  * ceil(log2 D) self-joins instead of D level-synchronous ones, so a
  * pathological 10k-deep trace costs 14 shuffles, not 10k. Lineage is
  * truncated per round with localCheckpoint (the
  * GraphOps.connectedComponents pattern) so the plan stays O(1).
  */
object TreeOps {

  /** Depth (edge count from the root) of every span.
    *
    * Input must carry `span_id` (globally unique), `parent_span_id`
    * (null at roots; dangling parents are treated as roots' parents —
    * i.e. a span whose parent id never appears gets the depth of its
    * known ancestors only). Output: (trace_id, span_id, depth).
    *
    * @param maxRounds hard cap on doubling rounds — covers depth up to
    *                  2^maxRounds; loud failure beyond it rather than a
    *                  silent wrong answer.
    * @param localParents set true when parent links never cross trace
    *                  boundaries and trace size is bounded by the
    *                  ingest cap (the TraceDataset contract): depths
    *                  then come from ONE trace-keyed shuffle + a
    *                  memoized linear local walk (measured 1060 → ~60 s
    *                  at sf100/100 M spans vs the quadrupling rounds,
    *                  whose per-round full-corpus checkpoints dominate).
    *                  Leave false for arbitrary forests.
    */
  def spanDepths(spans: DataFrame, maxRounds: Int = 40,
      localParents: Boolean = false): DataFrame = {
    if (localParents) return spanDepthsLocal(spans)
    // The iterated state carries ONLY (span_id, anc, dist): every round
    // materializes its frontier (localCheckpoint), so each extra
    // column pays its width × rounds — trace_id (a 16-byte id in
    // production) rides along zero times and rejoins once at the end.
    // Cursor init: one hop to the parent, or done (anc null, dist 0).
    //
    // FRONTIER SPLIT: after r rounds every span at depth ≤ 2^r is
    // resolved, so on realistic traces (depth ~10, log-rounds ~4) the
    // unresolved set collapses geometrically while total rounds are
    // bounded by the deepest trace. Iterating the full state anyway
    // re-joins and re-materializes ~N rows × rounds (the dominant cost
    // at 100 M spans); instead only UNRESOLVED cursors iterate, and
    // resolved rows retire into per-round checkpointed frames that
    // still serve as jump targets (an active cursor may point at a
    // resolved ancestor — the jump-source union covers both). Per-round
    // materialization is O(|frontier|), join left side shrinks with it.
    val init = spans.select(
      col("span_id"),
      col("parent_span_id").as("anc"),
      when(col("parent_span_id").isNull, 0L).otherwise(1L).as("dist"))
      .localCheckpoint()
    var frontier = init.filter(col("anc").isNotNull).localCheckpoint()
    var doneFrames = List(init.filter(col("anc").isNull).localCheckpoint())
    init.unpersist()

    // One cursor jump of `cur` against the cursors in `targets`: active
    // rows jump to their ancestor's cursor; a dangling anc (parent id
    // absent from the input) misses the join and resolves to
    // done-at-current-dist.
    def jump(cur: DataFrame, targets: Seq[DataFrame]): DataFrame = {
      val hop = targets.map(_.select(
        col("span_id").as("h_id"), col("anc").as("h_anc"), col("dist").as("h_dist")))
        .reduce(_ unionAll _)
      cur.join(hop, col("anc") === col("h_id"), "left_outer")
        .select(
          col("span_id"),
          col("h_anc").as("anc"),
          (col("dist") + coalesce(col("h_dist"), lit(0L))).as("dist"))
    }

    // POINTER QUADRUPLING (r9, the pathRollup lesson): two jumps per
    // materialized round — the intermediate frame serves as its own
    // jump target and recomputes inside the round's single job; at the
    // measured ~0.5 s fixed cost per materialized round, halving the
    // round count beats halving per-round work.
    var rounds = 0
    var active = !frontier.isEmpty
    while (active && rounds < maxRounds) {
      val once = jump(frontier, frontier :: doneFrames)
      val next = jump(once, once :: doneFrames).localCheckpoint()
      frontier.unpersist()
      doneFrames = next.filter(col("anc").isNull) :: doneFrames
      frontier = next.filter(col("anc").isNotNull)
      rounds += 1
      active = !frontier.isEmpty
    }
    require(!active, s"spanDepths did not converge in $maxRounds quadrupling rounds " +
      s"(depth > ${BigInt(4).pow(maxRounds)} or a parent cycle)")
    // NOTE: the round checkpoints stay live — the returned frame reads
    // the done frames (same contract as GraphOps.connectedComponents:
    // the caller may unpersist after consuming).
    val depths = doneFrames.map(_.select(col("span_id"), col("dist").as("depth")))
      .reduce(_ unionAll _)
    spans.select(col("trace_id"), col("span_id"))
      .join(depths, "span_id")
      .select(col("trace_id"), col("span_id"), col("depth"))
  }

  /** [[spanDepths]] under the in-trace parent contract: one trace-keyed
    * shuffle, then each span's depth resolves by a memoized parent-chain
    * walk — O(spans) per trace. Boundary semantics mirror the doubling
    * cursor exactly (TreeOpsSpec pins equality): roots (null parent)
    * at 0, a dangling parent id still costs its hop (the orphan sits at
    * 1 + its known-ancestor count), a parent cycle fails loudly.
    * Original trace_id/span_id column types pass through untouched. */
  private def spanDepthsLocal(spans: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val pre = spans.select(col("trace_id"), col("span_id"), col("parent_span_id"))
    val preSchema = pre.schema
    val outSchema = StructType(Seq(
      preSchema("trace_id"), preSchema("span_id"),
      StructField("depth", LongType, nullable = false)))
    pre.groupByKey(r => String.valueOf(r.get(0)))(Encoders.STRING)
      .flatMapGroups { (tid: String, it: Iterator[Row]) =>
        val rows = it.toArray
        val par = new scala.collection.mutable.HashMap[Any, Any]()
        val present = new scala.collection.mutable.HashSet[Any]()
        rows.foreach { r =>
          val sid = r.get(1)
          present.add(sid)
          if (!r.isNullAt(2)) par.update(sid, r.get(2))
        }
        val memo = new scala.collection.mutable.HashMap[Any, Long]()
        def resolve(sid0: Any): Long = {
          var chain = List.empty[Any]
          val inFlight = new scala.collection.mutable.HashSet[Any]()
          var cur = sid0
          var base = -1L
          while (base < 0 && !memo.contains(cur)) {
            require(inFlight.add(cur),
              s"spanDepthsLocal: parent cycle at span $cur in trace $tid")
            chain ::= cur
            par.get(cur) match {
              case Some(p) if present(p) => cur = p
              case Some(_) => base = 1L // dangling parent: the hop still counts
              case None => base = 0L // root
            }
          }
          var d = if (base >= 0) base - 1L else memo(cur)
          // the chain is root-most first; each member sits one hop deeper
          chain.foreach { sid => d += 1L; memo.update(sid, d) }
          memo(sid0)
        }
        rows.iterator.map { r =>
          Row(r.get(0), r.get(1), resolve(r.get(1)))
        }
      }(Encoders.row(outSchema))
  }

  /** Root→span service PATH of every span — the aggregated-flamegraph
    * key — by the same pointer-doubling cursor as [[spanDepths]], with
    * the cursor additionally carrying the SEGMENT of services between
    * the span and its known ancestor (exclusive): each jump
    * concatenates the ancestor's segment onto the span's, so a
    * depth-D chain assembles its path in ceil(log2 D) rounds. A span
    * whose parent id is absent from the input anchors its fragment
    * (path starts at itself), mirroring spanDepths' dangling rule.
    * Output: (trace_id, span_id, path) with path =
    * 'rootService/…/ownService'.
    */
  def spanPaths(spans: DataFrame, maxRounds: Int = 40): DataFrame = {
    val init = spans.select(
      col("span_id"),
      col("parent_span_id").as("anc"),
      array(col("service")).as("seg"))
      .localCheckpoint()
    var frontier = init.filter(col("anc").isNotNull).localCheckpoint()
    var doneFrames = List(init.filter(col("anc").isNull).localCheckpoint())
    init.unpersist()

    var rounds = 0
    var active = !frontier.isEmpty
    while (active && rounds < maxRounds) {
      val hop = (frontier :: doneFrames).map(_.select(
        col("span_id").as("h_id"), col("anc").as("h_anc"), col("seg").as("h_seg")))
        .reduce(_ unionAll _)
      val next = frontier.join(hop, col("anc") === col("h_id"), "left_outer")
        .select(
          col("span_id"),
          col("h_anc").as("anc"),
          when(col("h_seg").isNull, col("seg"))
            .otherwise(concat(col("seg"), col("h_seg"))).as("seg"))
        .localCheckpoint()
      frontier.unpersist()
      doneFrames = next.filter(col("anc").isNull) :: doneFrames
      frontier = next.filter(col("anc").isNotNull)
      rounds += 1
      active = !frontier.isEmpty
    }
    require(!active, s"spanPaths did not converge in $maxRounds doubling rounds " +
      s"(depth > ${BigInt(2).pow(maxRounds)} or a parent cycle)")
    val paths = doneFrames
      .map(_.select(col("span_id"), array_join(reverse(col("seg")), "/").as("path")))
      .reduce(_ unionAll _)
    spans.select(col("trace_id"), col("span_id"))
      .join(paths, "span_id")
      .select(col("trace_id"), col("span_id"), col("path"))
  }

  /** Root→span service paths by a PER-TRACE row-local walk — the
    * opt-in reconstruction engine behind [[pathRollup]]
    * (localParents = true): replaces a second full doubling loop,
    * which carried growing segment ARRAYS through ~7 rounds of
    * join+checkpoint (the dominant cost — measured 13.2 → ~5 s for
    * the rollup surfaces at sf0.1). Correct ONLY where parent links
    * stay inside the trace (the TraceDataset contract; a cross-trace
    * parent id anchors here where the global hop join of
    * [[spanPaths]] would resolve it) with trace sizes bounded by the
    * ingest cap: ONE trace-keyed shuffle, then each span walks its
    * parent links in an in-memory map — O(n·depth) per trace, bounded
    * by the cap. Dangling parents anchor the path and a parent CYCLE
    * fails loudly, both exactly like [[spanPaths]] (TreeOpsSpec pins
    * equality on a trace-local forest).
    */
  def spanPathsLocal(spans: DataFrame): DataFrame = {
    val s = spans.sparkSession
    import s.implicits._
    spans.select(col("trace_id").cast("string"), col("span_id").cast("string"),
        col("parent_span_id").cast("string"), col("service"))
      .as[(String, String, Option[String], String)]
      .groupByKey(_._1)
      .flatMapGroups { (tid, it) =>
        val rows = it.toArray
        val svc = new scala.collection.mutable.HashMap[String, String]()
        val par = new scala.collection.mutable.HashMap[String, String]()
        rows.foreach { case (_, sid, p, sv) =>
          svc.update(sid, sv)
          p.foreach(par.update(sid, _))
        }
        rows.iterator.map { case (_, sid, _, _) =>
          val seg = List.newBuilder[String]
          val seen = new scala.collection.mutable.HashSet[String]()
          var cur = sid
          var done = false
          while (!done) {
            require(seen.add(cur),
              s"spanPathsLocal: parent cycle at span $cur in trace $tid")
            seg += svc(cur)
            par.get(cur).filter(svc.contains) match {
              case Some(p) => cur = p
              case None => done = true
            }
          }
          (tid, sid, seg.result().reverse.mkString("/"))
        }
      }
      .toDF("trace_id", "span_id", "path")
  }

  /** Path rollup that never shuffles a path string for the bulk corpus.
    *
    * [[spanPaths]] carries each span's accumulated service-segment
    * ARRAY through every doubling round; at sf100 (100 M spans,
    * 99-deep chains) those variable-width rows blew the machine's
    * 250 GB of checkpoint+spill disk (measured, end of round 8). The
    * scale shape is the classic fingerprint-then-reconstruct split:
    *
    *   1. the doubling cursor carries a FIXED-WIDTH path fingerprint —
    *      a polynomial rolling hash h(seq) = Σ h(seg_i)·B^i over the
    *      self→root segment sequence, which composes under cursor
    *      jumps exactly like concatenation: (h,b) ⊕ (h',b') =
    *      (h + b·h' mod p, b·b' mod p). Two independent 31-bit prime
    *      moduli keep every product inside ANSI-safe long range and
    *      push the collision bound to ~k²/2^61 for k distinct paths;
    *   2. per-fingerprint aggregates (count, Σduration, min
    *      (trace_id, span_id) representative) collapse the corpus;
    *   3. path STRINGS are reconstructed by running [[spanPaths]] only
    *      on the representatives' traces — |distinct paths| traces, a
    *      constant-size relation independent of corpus scale.
    *
    * Output: (path, n_spans, total_dur_us), one row per distinct
    * root→self service path. Input must carry trace_id, span_id,
    * parent_span_id, service, duration_us.
    */
  /** `groupCols`: extra fixed-width per-span columns carried through
    * the cursor and grouped alongside the path fingerprint — the
    * differential-flamegraph hook (e.g. a time-half flag). They ride
    * every checkpoint, so keep them narrow (the spanDepths width
    * lesson). */
  /** `localParents`: set true when the input guarantees parent links
    * never cross trace boundaries (the TraceDataset contract, true of
    * every span relation the query pack builds) — BOTH the fingerprint
    * pass and the string reconstruction then run as one-shuffle
    * per-trace local walks ([[pathHashesLocal]] / [[spanPathsLocal]])
    * instead of pointer-quadrupling join rounds (measured 6.6 → ~3 s
    * for trace_path_rollup at sf0.1). Leave false for arbitrary
    * forests (e.g. cross-trace parent ids), where only the global hop
    * join is correct. */
  /** `srcMaterialized`: set true when `spans` is already a cheap read
    * (the caller checkpointed it, e.g. to share the scan with its own
    * midpoint aggregate) — skips the internal checkpoint, saving one
    * full-corpus write+read (~1.5-2 s at sf0.1 for the differential
    * flamegraph, whose caller must materialize anyway). */
  def pathRollup(spans: DataFrame, maxRounds: Int = 40,
      groupCols: Seq[String] = Nil, localParents: Boolean = false,
      srcMaterialized: Boolean = false): DataFrame = {
    // The input is scanned twice (cursor init + representative-trace
    // reconstruction); checkpoint the narrow projection ONCE so an
    // expensive upstream (the events->spans lag window costs ~1.3 s
    // per scan at sf0.1) is never recomputed.
    val srcRaw = spans.select(
      (Seq(col("trace_id"), col("span_id"), col("parent_span_id"),
        col("service"), col("duration_us")) ++ groupCols.map(col)): _*)
    val src = if (srcMaterialized) srcRaw else srcRaw.localCheckpoint()

    // Per-span fingerprint relation (ph, trace_id, span_id,
    // duration_us, groupCols…): ONE trace-keyed shuffle + linear local
    // DFS under the TraceDataset contract (localParents — measured
    // 6.6 → ~3 s for trace_path_rollup at sf0.1 vs the quadrupling
    // loop's 4 materialized rounds), or the pointer-quadrupling cursor
    // for arbitrary forests.
    val fps =
      if (localParents) pathHashesLocal(src, groupCols)
      else pathHashesDoubling(src, groupCols, maxRounds)

    // Corpus collapses on the combined 62-bit fingerprint; one
    // representative span per path seeds the string reconstruction.
    val roll = fps
      .groupBy("ph", groupCols: _*)
      .agg(count(lit(1)).as("n_spans"), sum("duration_us").as("total_dur_us"),
        min(struct(col("trace_id"), col("span_id"))).as("rep"))
      .localCheckpoint()

    // Reconstruct strings on the representatives' traces only —
    // |distinct paths| traces regardless of corpus size — via the
    // row-local per-trace walk (bounded traces by the TraceDataset
    // contract; a second doubling loop here paid ~7 more rounds of
    // join+checkpoint overhead — measured 13.2 → ~6 s at sf0.1).
    val repTraces = roll.select(col("rep.trace_id").as("trace_id")).distinct()
    val pruned = src
      .select("trace_id", "span_id", "parent_span_id", "service")
      .join(broadcast(repTraces), Seq("trace_id"), "left_semi")
    val repPaths =
      (if (localParents) spanPathsLocal(pruned) else spanPaths(pruned, maxRounds))
        .select(col("span_id").as("rep_span"), col("path"))
    roll.join(repPaths, roll("rep.span_id").cast("string") === col("rep_span"))
      .select((Seq(col("path")) ++ groupCols.map(col) ++
        Seq(col("n_spans"), col("total_dur_us"))): _*)
  }

  // Dual 31-bit prime moduli and bases of the path fingerprint
  // h(seq) = Σ h(seg_i)·B^i over the self→root segment sequence —
  // every b·h product stays inside ANSI-safe long range and the
  // collision bound is ~k²/2^61 for k distinct paths.
  private val (fpP1, fpP2) = (2147483647L, 2147483629L)
  private val (fpB1, fpB2) = (1000003L, 998244353L)

  /** Per-span path fingerprints by ONE trace-keyed shuffle + a linear
    * local walk — the [[spanPathsLocal]] engine emitting fixed-width
    * hash pairs instead of path strings, so the shuffled output stays
    * narrow at any depth. Valid under the same contract (parent links
    * stay in-trace, trace size bounded by the ingest cap): per-group
    * work is O(spans) via memoized parent-chain resolution. Dangling
    * parents anchor and a parent cycle fails loudly, exactly like the
    * doubling cursor. Output: (ph, trace_id, span_id, duration_us,
    * groupCols…) with trace_id/span_id in their ORIGINAL types — ids
    * are never cast to string, so a long-id corpus shuffles 8-byte
    * keys, not their decimal renderings (~3× narrower at 100 M spans);
    * the local maps key on the raw values.
    */
  private def pathHashesLocal(src: DataFrame, groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val pre = src.select(
      (Seq(col("trace_id"), col("span_id"), col("parent_span_id"),
        pmod(xxhash64(col("service")), lit(fpP1)).as("eh1"),
        pmod(xxhash64(lit("graft-fp2"), col("service")), lit(fpP2)).as("eh2"),
        col("duration_us")) ++ groupCols.map(col)): _*)
    val preSchema = pre.schema
    val outSchema = StructType(
      Seq(StructField("ph", LongType, nullable = false),
        preSchema("trace_id"), preSchema("span_id"),
        StructField("duration_us", preSchema("duration_us").dataType)) ++
      groupCols.map(g => preSchema(g)))
    val nGroup = groupCols.size
    pre.groupByKey(r => String.valueOf(r.get(0)))(Encoders.STRING)
      .flatMapGroups { (tid: String, it: Iterator[Row]) =>
        val rows = it.toArray
        val eh = new scala.collection.mutable.HashMap[Any, (Long, Long)]()
        val par = new scala.collection.mutable.HashMap[Any, Any]()
        rows.foreach { r =>
          val sid = r.get(1)
          eh.update(sid, (r.getLong(3), r.getLong(4)))
          if (!r.isNullAt(2)) par.update(sid, r.get(2))
        }
        // memoized bottom-up resolution: each span's hash derives from
        // its parent's in O(1), so the whole trace resolves in O(n)
        val memo = new scala.collection.mutable.HashMap[Any, (Long, Long)]()
        def resolve(sid0: Any): (Long, Long) = {
          var chain = List.empty[Any]
          val inFlight = new scala.collection.mutable.HashSet[Any]()
          var cur = sid0
          var anchor: Option[(Long, Long)] = None
          while (anchor.isEmpty && !memo.contains(cur)) {
            require(inFlight.add(cur),
              s"pathHashesLocal: parent cycle at span $cur in trace $tid")
            chain ::= cur
            par.get(cur).filter(eh.contains) match {
              case Some(p) => cur = p
              case None => anchor = Some((0L, 0L)) // root / dangling parent
            }
          }
          var h = anchor.getOrElse(memo(cur))
          chain.foreach { sid =>
            val (e1, e2) = eh(sid)
            h = (((e1 + fpB1 * h._1) % fpP1), ((e2 + fpB2 * h._2) % fpP2))
            memo.update(sid, h)
          }
          h
        }
        rows.iterator.map { r =>
          val (h1, h2) = resolve(r.get(1))
          Row.fromSeq(
            Seq(h1 * fpP2 + h2, r.get(0), r.get(1), r.get(5)) ++
            (0 until nGroup).map(i => r.get(6 + i)))
        }
      }(Encoders.row(outSchema))
  }

  /** Per-span path fingerprints by the pointer-quadrupling cursor —
    * correct for arbitrary forests (cross-trace parent ids, unbounded
    * traces). The cursor is FIXED-WIDTH ((span_id, anc, h1, b1, h2,
    * b2) plus the rollup payload) and composes under jumps exactly
    * like concatenation: (h,b) ⊕ (h',b') = (h + b·h' mod p, b·b' mod
    * p). Two jumps per materialized round — the intermediate
    * (distance-doubled) frame serves as its own jump target and
    * recomputes inside the round's single job; at the measured
    * ~0.5 s fixed cost per materialized round, halving the round
    * count beats halving per-round work (sf0.1: 7 rounds × 0.6 s →
    * 4 rounds).
    */
  private def pathHashesDoubling(
      src: DataFrame, groupCols: Seq[String], maxRounds: Int): DataFrame = {
    val (p1, p2) = (fpP1, fpP2)
    val (bb1, bb2) = (fpB1, fpB2)
    // Cursor: (span_id, anc, h1, b1, h2, b2) + the fixed-width payload
    // the rollup needs (trace_id, duration) so no corpus-wide rejoin.
    val init = src.select(
      (Seq(col("trace_id"), col("span_id"), col("duration_us"),
        col("parent_span_id").as("anc"),
        pmod(xxhash64(col("service")), lit(p1)).as("h1"), lit(bb1).as("b1"),
        pmod(xxhash64(lit("graft-fp2"), col("service")), lit(p2)).as("h2"),
        lit(bb2).as("b2")) ++ groupCols.map(col)): _*)
      .localCheckpoint()
    var frontier = init.filter(col("anc").isNotNull).localCheckpoint()
    var doneFrames = List(init.filter(col("anc").isNull).localCheckpoint())
    init.unpersist()

    // One fingerprint-composing jump of `cur` against the cursors in
    // `targets`: a dangling anc misses the join and anchors the path
    // (same rule as spanDepths/spanPaths).
    def jump(cur: DataFrame, targets: Seq[DataFrame]): DataFrame = {
      val hop = targets.map(_.select(
        col("span_id").as("h_id"), col("anc").as("h_anc"),
        col("h1").as("y1"), col("b1").as("c1"),
        col("h2").as("y2"), col("b2").as("c2")))
        .reduce(_ unionAll _)
      cur.join(hop, col("anc") === col("h_id"), "left_outer")
        .select(
          (Seq(col("trace_id"), col("span_id"), col("duration_us"),
            col("h_anc").as("anc"),
            when(col("y1").isNull, col("h1"))
              .otherwise(pmod(col("h1") + col("b1") * col("y1"), lit(p1))).as("h1"),
            when(col("y1").isNull, col("b1"))
              .otherwise(pmod(col("b1") * col("c1"), lit(p1))).as("b1"),
            when(col("y2").isNull, col("h2"))
              .otherwise(pmod(col("h2") + col("b2") * col("y2"), lit(p2))).as("h2"),
            when(col("y2").isNull, col("b2"))
              .otherwise(pmod(col("b2") * col("c2"), lit(p2))).as("b2")) ++
            groupCols.map(cur(_))): _*)
    }

    var rounds = 0
    var active = !frontier.isEmpty
    while (active && rounds < maxRounds) {
      val once = jump(frontier, frontier :: doneFrames)
      val next = jump(once, once :: doneFrames).localCheckpoint()
      frontier.unpersist()
      doneFrames = next.filter(col("anc").isNull) :: doneFrames
      frontier = next.filter(col("anc").isNotNull)
      rounds += 1
      active = !frontier.isEmpty
    }
    require(!active, s"pathRollup did not converge in $maxRounds quadrupling rounds " +
      s"(depth > ${BigInt(4).pow(maxRounds)} or a parent cycle)")
    doneFrames
      .map(_.select((Seq((col("h1") * p2 + col("h2")).as("ph"), col("trace_id"),
        col("span_id"), col("duration_us")) ++ groupCols.map(col)): _*))
      .reduce(_ unionAll _)
  }
}
