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
    * The salt comes from the row's position (monotonically_increasing_id
    * cycles through all salts within each input partition), NOT from a
    * hash of the value: a hot key whose rows share one value — the
    * constant-duration heartbeat-span case — would collapse into a
    * single salt bucket and resurrect the straggler. Position-derived
    * salt splits a hot key evenly no matter what its values are, stays
    * deterministic within a run, and the phase-two combine makes the
    * result independent of the salt assignment anyway. */
  def saltedAggregate(df: DataFrame, key: Column, valueCol: Column, salts: Int): DataFrame =
    df.select(key.as("k"), valueCol.as("v"))
      .withColumn("salt", pmod(monotonically_increasing_id(), lit(salts)))
      .groupBy("k", "salt")
      .agg(count(lit(1)).as("pc"), sum("v").as("ps"))
      .groupBy("k")
      .agg(sum("pc").as("n"), sum("ps").as("total"))
}
