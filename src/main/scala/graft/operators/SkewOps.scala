package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4): salted two-phase aggregation for
  * hot keys.
  *
  * A plain `groupBy(key)` sends ALL rows of a hot key to one reducer;
  * with a hot traceId (the reference caps these at ingest) or a hot
  * service name, that task becomes the straggler. Salting splits each
  * key into `salts` sub-keys for the first (heavy) aggregation, then
  * combines the per-salt partials with a second (tiny) aggregation —
  * shuffle skew bounded by 1/salts at the cost of one extra small
  * exchange.
  *
  * AQE's skew-join splitting covers joins; this covers aggregations,
  * where AQE cannot split a single key's group.
  */
object SkewOps {

  /** Salted distributed count+sum per key, equal to
    * `df.groupBy(key).agg(count, sum(valueCol))` but skew-resistant.
    *
    * The salt comes from the row's position within its partition, NOT
    * from a hash of the value: a hot key whose rows share one value —
    * the constant-duration heartbeat-span case — would collapse into a
    * single salt bucket and resurrect the straggler. Position-derived
    * salts are retry-hazardous in general (a recomputed map task that
    * enumerates rows in a different order re-salts them —
    * SPARK-23207's round-robin problem), so rows are first sorted
    * within each partition by (k, v): rows that differ get a
    * content-stable order, and rows that are bit-identical can permute
    * freely because any permutation yields the same (k, v, salt)
    * multiset — either way the map output is deterministic across
    * retries. Same mitigation Spark itself applies to round-robin
    * repartition (spark.sql.execution.sortBeforeRepartition). This
    * assumes each task re-reads the same input rows on retry — true
    * for scans and deterministic lineage; feed a nondeterministic
    * frame through [[saltedJoin]]'s checkpointed path instead. */
  def saltedAggregate(df: DataFrame, key: Column, valueCol: Column, salts: Int): DataFrame =
    df.select(key.as("k"), valueCol.as("v"))
      .sortWithinPartitions("k", "v")
      .withColumn("salt", pmod(monotonically_increasing_id(), lit(salts)))
      .groupBy("k", "salt")
      .agg(count(lit(1)).as("pc"), sum("v").as("ps"))
      .groupBy("k")
      .agg(sum("pc").as("n"), sum("ps").as("total"))

  /** Salted inner equi-join for a hot-keyed big side: each big row
    * gets a salt in [0, salts), the small side replicates once per salt
    * (explode of a salts-length array — `salts × |small|` rows, cheap
    * for a dim side), and the join key becomes (key, salt), so a hot
    * key's rows spread over `salts` reducers instead of one straggler.
    *
    * AQE's skew-join split covers sort-merge joins after the fact by
    * splitting oversized partitions; explicit salting also covers
    * shuffled-hash joins and keeps the split deterministic at plan
    * time. The result set is EXACTLY the plain inner join — each big
    * row meets each matching small row exactly once (the copy carrying
    * its salt) — which is what the q_salted_join oracle checks.
    *
    * Two salt schemes, picked by `positionSalts`:
    *
    *  - DEFAULT (false): a CONTENT hash of the whole row (`xxhash64`
    *    over every column) — deterministic across task retries by
    *    construction (SPARK-23207 needs no mitigation), row-local, and
    *    free of the full-row sortWithinPartitions the position scheme
    *    pays (that sort measured 10.5 s of the join at the 60M-row
    *    sf10 pack). Limitation: rows BIT-IDENTICAL in every column
    *    share one salt, and a low-entropy payload spreads over at most
    *    |distinct rows| salts — fine for typical fact tables, wrong
    *    for degenerate duplicate-row hot keys.
    *  - positionSalts = true: salts from the row's position after a
    *    content-stable local sort (the [[saltedAggregate]] scheme) —
    *    spreads even bit-identical duplicate rows (constant heartbeat
    *    spans) at the cost of sorting the big side's partitions. The
    *    local sort only stabilizes salts if each task re-reads the SAME
    *    input rows on retry; if `big`'s own lineage is nondeterministic
    *    (an unsorted round-robin repartition, a sampled subquery), a
    *    recomputed map task re-salts different rows than reducers
    *    already fetched — the SPARK-23207 silent-corruption class. To
    *    close that hole the salted big side is MATERIALIZED
    *    (`localCheckpoint`, eager) before the join: retries refetch the
    *    stored blocks instead of recomputing, so salts can never drift.
    *    Tradeoff: the checkpoint spends one pass + storage, and losing
    *    an executor fails the job loudly (blocks are not recoverable)
    *    instead of silently recomputing — the correct failure mode for
    *    a correctness-critical shuffle input.
    *
    * Columns of `big` and `small` must be disjoint; pre-alias as
    * needed. `_salt` is a RESERVED internal name: inputs carrying a
    * `_salt` column are rejected (withColumn would silently replace
    * the caller's column and the final drop would eat it). */
  def saltedJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, salts: Int,
      positionSalts: Boolean = false): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "saltedJoin reserves the internal column name _salt; rename or drop it on the input")
    val saltedBig =
      if (positionSalts)
        big.sortWithinPartitions(big.columns.map(col).toIndexedSeq: _*)
          .withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
          .localCheckpoint() // pin salts against retry recomputation (see scaladoc)
      else
        big.withColumn("_salt",
          pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)))
    val replicated = small
      .withColumn("_salt", explode(lit((0L until salts.toLong).toArray)))
    saltedBig
      .join(replicated,
        saltedBig(bigKey) === replicated(smallKey) && saltedBig("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
