package graft.operators

import graft.functions.BloomMightContain
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftPlanBridge

/** Bloom-prefiltered exact semi join — the "ship a sketch, not a
  * table" join strategy for a big probe side against a selective build
  * side (reference analogue: the trace-ID membership checks the
  * reader's multi-get path performs against the index before touching
  * the span store).
  *
  * At 100 TB the plain semi join shuffles (or at best broadcasts the
  * build side and still scans+emits) every probe row; here the build
  * side collapses to a few-MB bloom filter built in one distributed
  * aggregate pass (`DataFrameStatFunctions.bloomFilter` — Spark's
  * treeAggregate sketch), the probe side drops non-members INSIDE its
  * scan stage via the codegen'd [[BloomMightContain]] probe, and only
  * the surviving ~selectivity·(1+fpp) fraction reaches the exact join
  * that removes bloom false positives. Catalyst's own runtime filters
  * (InjectRuntimeFilter) do this opportunistically for shuffle joins;
  * this operator makes it explicit, tunable (items/fpp), and available
  * to any downstream op, not just joins.
  *
  * Result is EXACTLY the semi join (false positives die in the final
  * join; false negatives can't happen), so the DuckDB `IN` subquery
  * oracle stays valid — BloomJoinSpec additionally measures the
  * prefilter's row reduction.
  */
object BloomJoin {

  /** Build a bloom filter from `small`'s `smallKey` column (bigint or
    * string) and return `big` rows whose `bigKey` matches — exact semi
    * join semantics, bloom-pruned probe side. `expectedItems <= 0`
    * auto-sizes from a count of the build side (one cheap extra job) —
    * an undersized filter silently saturates past its fpp and the
    * prefilter stops dropping anything at larger scale factors.
    *
    * Column hygiene: the internal `__bloom_key` alias lives only on a
    * projection of the BUILD side and the semi join returns `big`'s
    * columns untouched, so unlike [[SkewOps.saltedJoin]]'s reserved
    * `_salt` there is no name `big` or `small` may not carry — both
    * join-side references are frame-qualified and can't go ambiguous. */
  def semiJoin(
      big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    val keyed = prefilter(big, small, bigKey, smallKey, expectedItems, fpp)
    // fresh alias keeps the exprIds unambiguous (small appears in both
    // the bloom build and the verify join)
    val rhs = small.select(org.apache.spark.sql.functions.col(smallKey).as("__bloom_key"))
    keyed.join(rhs, keyed(bigKey) === rhs("__bloom_key"), "left_semi")
  }

  /** Just the prefilter stage, for callers composing something other
    * than a semi join downstream (anti join needs the exact join —
    * bloom alone can't prove absence — but aggregation-after-membership
    * pipelines use this directly). */
  def prefilter(
      big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    val items = if (expectedItems > 0) expectedItems else math.max(1L, small.count())
    val bloom = small.stat.bloomFilter(smallKey, items, fpp)
    big.filter(probe(big(bigKey), bloom))
  }

  /** `bloom_might_contain(key)` as a Column, for ad-hoc composition. */
  def probe(key: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    GraftPlanBridge.columnOf(BloomMightContain(GraftPlanBridge.expressionOf(key), bloom))
}
