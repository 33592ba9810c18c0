package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT percentiles — the scale form of Spark's
  * `percentile` / `percentile_disc` / `median` aggregates.
  *
  * The builtins are TypedImperativeAggregates: every group buffers its
  * full value→count map in one reducer task and sorts it at eval. With
  * few groups that is a third of the corpus's distinct values in ONE
  * task — the r8 sf10 pack measured q_percentiles (3 groups over 60 M
  * rows) at 124 s, the pack's third pole. This operator computes the
  * same numbers with no per-group buffering anywhere:
  *
  *   1. `(keys, value) → Σweight` — the only full-data shuffle, and it
  *      map-combines, so the wire carries distinct values, not rows;
  *   2. cumulative weight in value order per key via
  *      [[ShardedWindow.runningSum]] two-phase prefix sums
  *      (parallelism = #(key, value-range shard), never one task per
  *      key);
  *   3. rank selection: each requested percentile is a `min(value
  *      WHERE cum ⋈ threshold)` aggregate over the cumulative relation
  *      — map-combined again, integer math for discrete thresholds
  *      (`den·cum >= num·n`, no float edge), and Spark `Percentile`'s
  *      own `lower + (higher-lower)·(pos - ⌊pos⌋)` double formula for
  *      the continuous form so results are bit-identical to the
  *      builtin (ExactQuantilesSpec pins this on longs and doubles,
  *      ties, odd/even counts, and weighted input).
  *
  * Percentiles are rational `num/den` so discrete thresholds stay in
  * long arithmetic; for the continuous form `num.toDouble/den` is the
  * correctly-rounded quotient, i.e. the same double the literal would
  * parse to (1/2 → 0.5, 19/20 → 0.95, 99/100 → 0.99).
  *
  * Weighted input is the same algorithm with `Σweight` in place of
  * counts, matching `percentile(value, p, freq)` semantics (a weight-w
  * value is w repeated values; total weight W replaces n).
  *
  * Null values are dropped, as every builtin percentile does; the
  * optional `countOut` column is therefore the non-null (weighted)
  * count.
  */
object ExactQuantiles {

  sealed trait Spec { def out: String }
  /** `percentile_disc(num/den)`: smallest value with cume_dist >= p. */
  final case class Disc(out: String, num: Long, den: Long) extends Spec
  /** `percentile(num/den)`: linear interpolation at pos=(n-1)·p. */
  final case class Cont(out: String, num: Long, den: Long) extends Spec

  /** Value-range shard for [[ShardedWindow]]: monotone in the value by
    * construction, so it satisfies the sharded-window ordering
    * contract. Pick width so that (value range / width) · #keys stays
    * broadcast-small (it is the prefix-sum fan-in) but well above the
    * executor count. */
  def valueShard(value: Column, width: Double): Column =
    floor(value / lit(width))

  /** Fully-sharded path: no task anywhere holds more than a value-range
    * shard of one key. Use when distinct values per key are UNBOUNDED
    * (raw doubles, computed ratios, prices at corpus scale). */
  def percentiles(
      df: DataFrame,
      keys: Seq[String],
      value: Column,
      shardWidth: Double,
      pcts: Seq[Spec],
      weight: Column = lit(1L),
      countOut: Option[String] = None): DataFrame = {
    val nCol = checkArgs(df, pcts, countOut)
    // NOT checkpointed (r14 measured): the grid feeds both sharded-
    // window phases and AQE's stage cache cannot dedupe the two
    // derivations (same-wave lookups miss — the cache inserts the
    // post-codegen-optimized stage subtree as key but looks raw
    // exchanges up), but materializing the grid once via
    // localCheckpoint measured WORSE (q_percentiles 1.45 → 1.91 s,
    // q_iqr_outliers 1.69 → 2.40 s): under AQE even a lazy checkpoint
    // executes its upstream stages at construction and serializes the
    // pipeline, while the duplicate derivation is a map-combined
    // re-scan that overlaps with the other wave-1 stages.
    val vc = df
      .select((keys.map(col) :+ value.as("_eq_v") :+ weight.as("_eq_w")): _*)
      .filter(col("_eq_v").isNotNull)
      .groupBy((keys.map(col) :+ col("_eq_v")): _*)
      .agg(sum("_eq_w").as("_eq_cnt"))
    // per-key n rides the sharded scan's own (tiny) totals relation —
    // a separate vc.groupBy(keys) aggregate was a third full
    // derivation of vc for one number per key (r13)
    val cum = ShardedWindow.runningSum(
      vc, keys, valueShard(col("_eq_v"), shardWidth),
      order = Seq(col("_eq_v")), value = col("_eq_cnt"), out = "_eq_cum",
      keyTotalOut = Some("_eq_n"))
    selectRanks(cum, keys, pcts, nCol, countOut)
  }

  /** Compact path over a pre-aggregated `(keys, value) → weight`
    * relation (repeat (keys, value) rows are fine — weights add): ONE
    * per-key window + the selection agg, nothing else. Parallelism is
    * one task per key, so this is for inputs whose rows per key are
    * DISTINCT-BOUNDED — duration histograms, score buckets, any
    * discretized domain where the count pre-agg (which the caller has
    * already paid) collapsed the corpus to its value domain. The
    * stage-count saving vs the sharded path is ~5 exchanges per call —
    * decisive when the percentile sits inside a larger query graph
    * (trace_latency_anomaly runs two of these back to back). */
  /** `extraAggs` piggyback on the final selection aggregate (they may
    * reference the input's own columns, which ride along) — a caller
    * needing sums/counts NEXT TO the percentile gets them in the same
    * single pass instead of a second aggregation over the counts
    * relation (trace_service_graph's calls/err/total ride its p95). */
  def percentilesFromCounts(
      counts: DataFrame,
      keys: Seq[String],
      value: Column,
      weight: Column,
      pcts: Seq[Spec],
      countOut: Option[String] = None,
      extraAggs: Seq[Column] = Nil): DataFrame = {
    val nCol = checkArgs(counts, pcts, countOut)
    val keyCols = keys.map(col)
    val wCum = Window.partitionBy(keyCols: _*).orderBy(col("_eq_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCols: _*)
    val j = counts
      .withColumn("_eq_v", value)
      .filter(col("_eq_v").isNotNull)
      .withColumn("_eq_cnt", weight)
      .withColumn("_eq_cum", sum("_eq_cnt").over(wCum))
      .withColumn("_eq_n", sum("_eq_cnt").over(wAll))
    selectRanks(j, keys, pcts, nCol, countOut, extraAggs)
  }

  private def checkArgs(
      df: DataFrame, pcts: Seq[Spec], countOut: Option[String]): String = {
    require(pcts.nonEmpty, "at least one percentile spec")
    val nCol = countOut.getOrElse("_eq_n_out")
    val reserved = Seq("_eq_v", "_eq_w", "_eq_cnt", "_eq_cum", "_eq_n", nCol)
    require(!df.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString(", ")}")
    nCol
  }

  /** Rank selection over a relation carrying `(keys, _eq_v, _eq_cum,
    * _eq_n)`: one pass of map-combined `min(value WHERE rank reached)`
    * aggregates; n rides along (frac for Cont derives from it). */
  private def selectRanks(
      j: DataFrame,
      keys: Seq[String],
      pcts: Seq[Spec],
      nCol: String,
      countOut: Option[String],
      extraAggs: Seq[Column] = Nil): DataFrame = {
    val aggs = extraAggs ++ pcts.flatMap {
      case Disc(out, num, den) =>
        Seq(min(when(col("_eq_cum") * den >= col("_eq_n") * num, col("_eq_v")))
          .as(out))
      case Cont(out, num, den) =>
        val pos = (col("_eq_n") - 1).cast("double") * lit(num.toDouble / den)
        Seq(
          min(when(col("_eq_cum") >= floor(pos) + 1, col("_eq_v"))).as(s"_lo_$out"),
          min(when(col("_eq_cum") >= ceil(pos) + 1, col("_eq_v"))).as(s"_hi_$out"))
    } :+ max(col("_eq_n")).as(nCol)
    val agged = j.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)

    // continuous finals: Spark Percentile.getPercentile's exact double
    // expression — `lowerKey` when the position is integral, else the
    // two-sided `(higher-pos)·lower + (pos-lower)·higher` (NOT the
    // algebraically-equal one-sided lerp: they differ in the last ulp
    // and the spec pins bit-identity with the builtin)
    val finals = pcts.foldLeft(agged) {
      case (d, Cont(out, num, den)) =>
        val pos = (col(nCol) - 1).cast("double") * lit(num.toDouble / den)
        val lower = floor(pos).cast("double")
        val higher = ceil(pos).cast("double")
        d.withColumn(out,
            when(higher === lower, col(s"_lo_$out").cast("double"))
              .otherwise((higher - pos) * col(s"_lo_$out") +
                (pos - lower) * col(s"_hi_$out")))
          .drop(s"_lo_$out", s"_hi_$out")
      case (d, _) => d
    }
    if (countOut.isDefined) finals else finals.drop(nCol)
  }
}
