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
      expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame =
    big.filter(probe(big(bigKey), build(small, smallKey, expectedItems, fpp)))

  /** Build the filter itself: one declarative aggregate pass over the
    * build side via Catalyst's own `BloomFilterAggregate` (the
    * machinery behind InjectRuntimeFilter), with EXPLICIT
    * estimatedNumItems/numBits literals.
    *
    * Explicit sizing is not a nicety — Spark 4's
    * `DataFrameStatFunctions.bloomFilter` routes through the same
    * aggregate but clamps numBits at
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default
    * 2^26 bits = 8 MB). At 21 M build keys that clamp silently
    * degrades a requested 1% fpp to a measured 76%: the prefilter
    * still answers correctly (the verify join eats the false
    * positives) but passes 79% of a 600 M-row probe side instead of
    * 15% — the whole point of the operator lost without a single
    * error. The put/probe conventions (putLong /
    * putBinary(UTF8 bytes)) are identical between the aggregate's
    * updaters and [[BloomMightContain]], so the swap is
    * semantics-free. Sizing still auto-derives from one cheap
    * pruned-scan count when `expectedItems <= 0`; the aggregate pass
    * replaces the prior RDD treeAggregate build. */
  def build(
      small: DataFrame, smallKey: String,
      expectedItems: Long = 0L, fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val items = if (expectedItems > 0) expectedItems else math.max(1L, small.count())
    val numBits = math.max(64L,
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(items, fpp))
    val agg = new BloomFilterAggregate(
      GraftPlanBridge.expressionOf(small(smallKey)), Literal(items), Literal(numBits))
      .toAggregateExpression()
    // the aggregate clamps its sizing to min(literal, conf) INTERNALLY
    // (lazy vals read SQLConf at buffer creation), so explicit literals
    // alone don't escape the 8 MB default — raise the caps for the
    // duration of this one eager build, then restore (queries construct
    // sequentially; the set/restore window contains only this action)
    val sess = small.sparkSession
    val caps = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> items,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> numBits)
    val saved = caps.map { case (k, _) => k -> sess.conf.getOption(k) }
    val bytes =
      try {
        caps.foreach { case (k, v) =>
          sess.conf.set(k, math.max(v, sess.conf.get(k, "0").toLong).toString)
        }
        small.select(GraftPlanBridge.columnOf(agg).as("bloom_bytes"))
          .head().getAs[Array[Byte]]("bloom_bytes")
      } finally saved.foreach {
        case (k, Some(v)) => sess.conf.set(k, v)
        case (k, None) => sess.conf.unset(k)
      }
    // an empty build side evals to null: an all-absent filter keeps the
    // "false negatives impossible, prefilter drops non-members" contract
    if (bytes == null) org.apache.spark.util.sketch.BloomFilter.create(1, fpp)
    else org.apache.spark.util.sketch.BloomFilter.readFrom(bytes)
  }

  /** `bloom_might_contain(key)` as a Column, for ad-hoc composition. */
  def probe(key: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    GraftPlanBridge.columnOf(BloomMightContain(GraftPlanBridge.expressionOf(key), bloom))
}
