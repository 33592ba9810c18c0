package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-graph operators over edge lists — the cluster-forming step a
  * dedup pipeline runs AFTER candidate pair generation: near-duplicate
  * pairs (minhash/simhash/cosine) form components, and each component
  * keeps one canonical document.
  *
  * Spark realization: iterative min-label propagation (the classic
  * large-graph connected-components shape — HashToMin-style): every
  * node starts labeled with itself; each round, a node takes the
  * minimum label among itself and its neighbors; converged when no
  * label changes. Each round is one join + one partial-aggregated
  * groupBy on node id — no driver-side graph state, and per-round
  * lineage is truncated (localCheckpoint) so the plan doesn't grow
  * with iterations. Rounds needed = graph diameter, which for dedup
  * clusters (cliques and near-cliques) is 1–2; `maxIter` bounds
  * adversarial chains.
  */
object GraphOps {

  /** Connected components of the undirected graph given by (src, dst)
    * edge rows → (node, component) where component = the component's
    * minimum node id. Nodes appear iff they occur in some edge.
    *
    * Throws IllegalStateException if the fixpoint hasn't converged
    * within `maxIter` rounds (component diameter exceeds the bound) —
    * a silently truncated propagation would report one component as
    * several, and the caller couldn't tell. Raise `maxIter` for
    * long-chain graphs. Superseded per-iteration checkpoints are
    * unpersisted as soon as the next round is materialized, so
    * block-manager storage stays O(1) frames regardless of rounds.
    *
    * The RETURNED frame is itself a localCheckpoint (the label set can
    * be arbitrarily large, so it is not copied to the driver the way
    * kmeansCentroids copies its k-row result). Callers that are done
    * with it may `unpersist()` it; otherwise Spark's ContextCleaner
    * reclaims the blocks once the frame is garbage-collected — the
    * cost of holding it is one cached (node, component) pair per edge
    * endpoint, not a permanent leak. */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String, maxIter: Int = 20): DataFrame = {
    // materialize the edge list ONCE before mirroring it — the union
    // would otherwise execute the (possibly expensive) edge subtree
    // twice, e.g. the whole minhash banding pipeline
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b")).localCheckpoint()
    val bidir = e
      .union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    e.unpersist()

    var labels = bidir.select(col("a").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = bidir
        .join(labels, col("a") === col("node"))
        .groupBy(col("b").as("nb"))
        .agg(min("component").as("ncomp"))
      val updated = labels
        .join(neighborMin, col("node") === col("nb"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("ncomp"), col("component"))).as("component"))
        .localCheckpoint()
      converged = updated.as("u")
        .join(labels.select(col("node"), col("component").as("old")), "node")
        .filter(col("component") =!= col("old"))
        .isEmpty
      labels.unpersist()
      labels = updated
      iter += 1
    }
    bidir.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds " +
          "(component diameter exceeds the bound); raise maxIter")
    labels
  }

  /** Weighted PageRank over an edge list, a FIXED number of power
    * iterations (deterministic by construction — no float convergence
    * test). Each round is one keyed join + one map-combinable agg, so
    * at scale the cost is iters × (join shuffle on src + agg shuffle
    * on dst); lineage truncates per round like connectedComponents.
    *
    * Dangling nodes (no out-edges) leak their mass by default —
    * acceptable for relative-importance ranking. With
    * `redistributeDangling = true` each round adds the dangling
    * nodes' pooled rank back uniformly (the standard stochastic-fix:
    * equivalent to a virtual all-nodes out-edge set), so the rank
    * vector stays a proper distribution (sums to 1) on any graph.
    * The pool is a 1-row broadcast aggregate per round — no driver
    * collect, no extra shuffle of the rank vector.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
      iters: Int, damping: Double = 0.85,
      redistributeDangling: Boolean = false): DataFrame = {
    // iters = 0 would return a lazy projection over the `nodes`
    // checkpoint that the cleanup below unpersists — at least one
    // round guarantees the returned frame is its OWN checkpoint
    require(iters >= 1, s"pageRank needs at least one iteration, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).as("w")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().localCheckpoint()
    val n = nodes.count().toDouble
    val outw = e.groupBy("src").agg(sum("w").as("ow"))
    // transition probability: exact-int division, identical on any engine
    val ew = e.join(outw, "src")
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("ow").cast("double")).as("p"))
      .localCheckpoint()
    val dangling = nodes
      .join(ew.select(col("src").as("node")).distinct(), Seq("node"), "left_anti")
      .localCheckpoint()
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      val inflow = ew.join(ranks, col("src") === col("node"))
        .groupBy(col("dst")).agg(sum(col("rank") * col("p")).as("infl"))
      val base = nodes.join(inflow, col("node") === col("dst"), "left_outer")
      val next = (if (redistributeDangling) {
        val pool = ranks.join(dangling, "node")
          .agg(coalesce(sum("rank"), lit(0.0)).as("dm"))
        base.crossJoin(broadcast(pool))
          .select(col("node"),
            (lit((1 - damping) / n) + lit(damping) *
              (coalesce(col("infl"), lit(0.0)) + col("dm") / n)).as("rank"))
      } else
        base.select(col("node"),
          (lit((1 - damping) / n) + lit(damping) * coalesce(col("infl"), lit(0.0)))
            .as("rank"))).localCheckpoint()
      ranks.unpersist()
      ranks = next
    }
    // release the setup checkpoints — the returned ranks frame is its
    // own materialized checkpoint, so nothing downstream needs these
    // (the kmeansCentroids lesson: leaked blocks accumulate per call)
    e.unpersist(); nodes.unpersist(); ew.unpersist(); dangling.unpersist()
    ranks
  }

  /** Synchronous weighted label propagation — community detection by
    * iterated neighbor vote: each round, every node adopts the label
    * with the largest incident edge-weight sum among its neighbors'
    * CURRENT labels (ties to the smallest label; isolated nodes keep
    * their own), for a FIXED `iters` rounds — deterministic by
    * construction, like [[pageRank]]'s fixed power iterations (LPA's
    * usual async/random variant is explicitly not reproducible).
    * Nodes start labeled by themselves. Input edges are treated as
    * DIRECTED votes (src listens to dst); pass a mirrored relation
    * for the undirected semantics.
    *
    * Scale: per round one join of the edge list against the k-row
    * label table on dst + one map-combined (src, label) weight sum +
    * one argmax agg — the same keyed-join-per-round shape as
    * pageRank, lineage truncated per round.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iters: Int): DataFrame = {
    require(iters >= 1, s"labelPropagation needs at least one iteration, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).as("w")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().localCheckpoint()
    var labels = nodes.withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      val votes = e.join(labels, col("dst") === col("node"))
        .groupBy(col("src"), col("label").as("cand"))
        .agg(sum("w").as("wsum"))
        .groupBy(col("src"))
        .agg(min(struct((-col("wsum")).as("nw"), col("cand"))).as("top"))
        .select(col("src"), col("top.cand").as("win"))
      val next = labels
        .join(votes, col("node") === col("src"), "left")
        .select(col("node"), coalesce(col("win"), col("label")).as("label"))
        .localCheckpoint()
      labels.unpersist()
      labels = next
    }
    e.unpersist(); nodes.unpersist()
    labels
  }

  /** All-pairs minimum-hop reachability (transitive closure annotated
    * with shortest hop counts) over a directed edge list →
    * (src, dst, hops), hops ≥ 1: BFS frontier expansion, where round
    * h+1 joins ONLY the hop-h frontier against the edge list and
    * anti-joins pairs already in the closure — so each pair is
    * recorded exactly at its minimum hop and cycles terminate
    * naturally (an exhausted frontier IS the fixpoint; no hop bound
    * in the result semantics). Throws if `maxIter` rounds pass with a
    * non-empty frontier (graph diameter exceeds the bound) rather
    * than silently truncating the closure.
    *
    * Scale: the edge list is distinct-projected and checkpointed once
    * before iterating; each round shuffles the CURRENT frontier (the
    * newly discovered pairs only — never the accumulated closure)
    * against the edges on dst=src plus one anti-join against the
    * closure so far. No round rescans the raw input, and lineage is
    * truncated per round like [[connectedComponents]]. For
    * service-graph-sized node sets every per-round join broadcasts;
    * at web-graph scale the identical plan shuffles on the same keys.
    */
  def reachability(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    val e = edges.select(col(srcCol).as("esrc"), col(dstCol).as("edst"))
      .distinct().localCheckpoint()
    var closure = e.select(col("esrc").as("src"), col("edst").as("dst"),
      lit(1L).as("hops")).localCheckpoint()
    var frontier = closure
    var iter = 1
    var drained = frontier.isEmpty
    while (!drained && iter < maxIter) {
      val next = frontier.join(e, frontier("dst") === e("esrc"))
        .select(frontier("src"), e("edst").as("dst"))
        .distinct()
        .join(closure, Seq("src", "dst"), "left_anti")
        .withColumn("hops", lit(iter + 1L))
        .localCheckpoint()
      val merged = closure.union(next).localCheckpoint()
      // old frontier/closure frames are superseded; merged and next are
      // their own checkpoints, so the blocks can go immediately
      if (!(frontier eq closure)) frontier.unpersist()
      closure.unpersist()
      closure = merged
      frontier = next
      drained = frontier.isEmpty
      iter += 1
    }
    if (!drained)
      throw new IllegalStateException(
        s"reachability did not converge within $maxIter rounds " +
          "(graph diameter exceeds the bound); raise maxIter")
    frontier.unpersist(); e.unpersist()
    closure
  }
}
