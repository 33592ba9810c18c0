package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-state Viterbi as a PARALLEL tropical-semiring scan.
  *
  * The burst-detection DP
  * `V_s(h) = emit_s(h) + min(V_s(h−1), V_{s'}(h−1) + T)` looks
  * inherently sequential, but each hour is a 2×2 matrix over the
  * (min, +) semiring — `A_h[a][b] = (a≠b ? T : 0) + emit_b(h)` — and
  * min-plus matrix multiplication is ASSOCIATIVE, so the product over
  * an hour range folds pairwise: ceil(log2 H) rounds of merging
  * adjacent segments, each round one map-combined aggregate keyed by
  * (key, idx div 2). A month of hours resolves in 10 rounds
  * regardless of how many keys or how much data produced the hourly
  * costs; the classic sequential pass would be H chained steps.
  *
  * Input: one row per (key, idx, e0, e1) with `idx` the DENSE 0-based
  * position and e0/e1 the two states' integer emission costs.
  * Output: (key, m00, m01, m10, m11) — the full-range path-cost
  * matrix (entry [a][b] = cheapest path entering at state a, leaving
  * at state b, transitions charged INSIDE the range only, plus every
  * hour's emission including the first's — the first hour's matrix is
  * built transition-free). min(m00, m01) is the unconstrained optimum
  * starting baseline; all four entries are exact longs.
  */
object TropicalScan {

  def viterbi2(hourly: DataFrame, keyCol: String, idxCol: String,
      e0Col: String, e1Col: String, transPenalty: Column,
      maxRounds: Int = 24): DataFrame = {
    // atomic matrices; the range-initial hour (idx 0) charges no
    // entering transition: both rows equal its emissions
    var seg = hourly.select(col(keyCol).as("key"), col(idxCol).as("idx"),
        when(col(idxCol) === 0L, col(e0Col))
          .otherwise(col(e0Col)).as("m00"),
        when(col(idxCol) === 0L, col(e1Col))
          .otherwise(transPenalty + col(e1Col)).as("m01"),
        when(col(idxCol) === 0L, col(e0Col))
          .otherwise(transPenalty + col(e0Col)).as("m10"),
        when(col(idxCol) === 0L, col(e1Col))
          .otherwise(col(e1Col)).as("m11"))
      .localCheckpoint()
    var rounds = 0
    var multi = seg.groupBy("key").count().filter(col("count") > 1).isEmpty == false
    while (multi && rounds < maxRounds) {
      val paired = seg
        .withColumn("idx2", expr("idx div 2"))
        .withColumn("side", expr("idx % 2"))
      // min-plus product L ⊗ R computed row-locally after pivoting the
      // (at most two) segments of a pair onto one row; a lone segment
      // (odd tail) carries through unchanged
      val merged = paired.groupBy("key", "idx2")
        .agg(
          min(when(col("side") === 0, col("m00"))).as("l00"),
          min(when(col("side") === 0, col("m01"))).as("l01"),
          min(when(col("side") === 0, col("m10"))).as("l10"),
          min(when(col("side") === 0, col("m11"))).as("l11"),
          min(when(col("side") === 1, col("m00"))).as("r00"),
          min(when(col("side") === 1, col("m01"))).as("r01"),
          min(when(col("side") === 1, col("m10"))).as("r10"),
          min(when(col("side") === 1, col("m11"))).as("r11"))
        .select(col("key"), col("idx2").as("idx"),
          when(col("r00").isNull, col("l00"))
            .when(col("l00").isNull, col("r00"))
            .otherwise(least(col("l00") + col("r00"), col("l01") + col("r10"))).as("m00"),
          when(col("r00").isNull, col("l01"))
            .when(col("l00").isNull, col("r01"))
            .otherwise(least(col("l00") + col("r01"), col("l01") + col("r11"))).as("m01"),
          when(col("r00").isNull, col("l10"))
            .when(col("l00").isNull, col("r10"))
            .otherwise(least(col("l10") + col("r00"), col("l11") + col("r10"))).as("m10"),
          when(col("r00").isNull, col("l11"))
            .when(col("l00").isNull, col("r11"))
            .otherwise(least(col("l10") + col("r01"), col("l11") + col("r11"))).as("m11"))
        .localCheckpoint()
      seg.unpersist()
      seg = merged
      rounds += 1
      multi = merged.groupBy("key").count().filter(col("count") > 1).isEmpty == false
    }
    require(!multi, s"viterbi2 did not fold to one segment per key in $maxRounds rounds")
    seg.select("key", "m00", "m01", "m10", "m11")
  }
}
