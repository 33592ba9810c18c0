package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto frontier: minimize one dimension,
  * maximize the other) — the multi-criteria "best tradeoffs" operator
  * relational engines ship as SKYLINE OF.
  *
  * Strategy is the standard two-phase distributed skyline: each
  * partition computes its LOCAL skyline with a sorted sweep (a local
  * skyline is a superset of the global one restricted to that
  * partition, so nothing global is ever lost), then the surviving
  * frontier — typically orders of magnitude smaller than the input —
  * is swept once more in a single task. The O(n²) dominance join never
  * happens; total cost is one sort per partition plus a tiny final
  * pass. The per-partition sweep is genuine imperative per-partition
  * logic (the documented mapPartitions niche).
  *
  * Dominance: q dominates p iff q.min ≤ p.min ∧ q.max ≥ p.max with at
  * least one strict. Exact ties on BOTH dims dominate neither way, so
  * duplicated points all survive.
  */
object SkylineOps {

  /** Public for the Dataset encoder: Spark's generated safe-projection
    * constructs rows via the class's public constructor — a private
    * case class fails Janino compilation at runtime. */
  final case class Pt(key: Long, vmin: Double, vmax: Long)

  /** Sweep over rows sorted by (vmin asc, vmax desc, key asc): a row
    * survives iff no strictly-cheaper row had ≥ its vmax, and no
    * equal-vmin row has a strictly larger vmax. */
  private def sweep(it: Iterator[Pt]): Iterator[Pt] = {
    var started = false
    var maxBefore = Long.MinValue // max vmax among strictly cheaper rows
    var curMin = 0.0 // current vmin run
    var groupMax = Long.MinValue // the run's best vmax (its first row)
    it.flatMap { p =>
      if (!started || curMin != p.vmin) {
        started = true
        maxBefore = math.max(maxBefore, groupMax)
        curMin = p.vmin
        groupMax = p.vmax
      }
      if (p.vmax == groupMax && p.vmax > maxBefore) Some(p) else None
    }
  }

  /** Skyline of `df` minimizing `minCol` (double) and maximizing
    * `maxCol` (integral), `keyCol` as the stable row identity.
    * Output: (key, vmin, vmax), one row per surviving input row. */
  def skyline2d(df: DataFrame, keyCol: String, minCol: String, maxCol: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val pts = df.select(col(keyCol).cast("long").as("key"),
      col(minCol).cast("double").as("vmin"), col(maxCol).cast("long").as("vmax"))
      .as[Pt]
    val local = pts
      .sortWithinPartitions(col("vmin"), col("vmax").desc, col("key"))
      .mapPartitions(sweep)
    local
      .repartition(1)
      .sortWithinPartitions(col("vmin"), col("vmax").desc, col("key"))
      .mapPartitions(sweep)
      .toDF("key", "vmin", "vmax")
  }
}
