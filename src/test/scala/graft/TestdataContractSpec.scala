package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** Schema contract over the DRIVER-GENERATED testdata. The driver has
  * regenerated /root/testdata mid-round before (r7: events.ts flipped
  * from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS), silently
  * breaking 64 surfaces at analysis time). This spec makes the next
  * such flip fail ONE named test at round start instead of 98 unnamed
  * ones at round end: it asserts the DERIVED span-relation types — the
  * contract every trace surface actually consumes — not the physical
  * file encoding, which [[Tables.eventTimeUs]] is free to absorb. */
class TestdataContractSpec extends AnyFunSuite with SparkTestBase {

  test("derived span relation has the contracted types") {
    val spans = graft.operators.SpanOps.spansFromEvents(Tables.events(spark, sfDir))
    val types = spans.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("trace_id") === StringType)
    assert(types("span_id") === LongType)
    assert(types("service") === StringType)
    assert(types("start_us") === LongType)
    assert(types("duration_us") === LongType)
  }

  test("start_us is plausibly micros-since-epoch and one aggregate is sane") {
    val spans = graft.operators.SpanOps.spansFromEvents(Tables.events(spark, sfDir))
    val row = spans.agg(
      count(lit(1)).as("n"),
      min("start_us").as("lo"),
      max("start_us").as("hi")).head()
    assert(row.getLong(0) > 0, "events table is empty")
    // 2001-09-09 .. 2286-11-20 in MICROseconds — a nanos value read as
    // micros lands ~year 33658, a millis value lands in 1970; both fail
    assert(row.getLong(1) > 1000000000000000L, s"start_us lo=${row.getLong(1)} not micros")
    assert(row.getLong(2) < 9999999999999999L, s"start_us hi=${row.getLong(2)} not micros")
  }

  test("event ids are dense from 0 (q_range_join's fixed-workload cap assumes it)") {
    // q_range_join anchors its incident windows at span_id < 100000 ==
    // "the base pack" — valid because driver packs use dense 0..N-1 ids
    // and ScaleUp shifts replicas past max+1. If the driver ever
    // switches to sparse/random ids this fails here, not at the bench.
    val events = Tables.events(spark, sfDir)
    val row = events.agg(min("event_id"), max("event_id"), count(lit(1))).head()
    assert(row.getLong(0) === 0L, "event_id does not start at 0")
    assert(row.getLong(1) === row.getLong(2) - 1L, "event_id range is not dense")
  }

  test("eventTimeUs matches DuckDB epoch_us semantics on the current encoding") {
    // epoch_us(ts) on timestamp[us] is the stored micros value; the
    // Spark side must agree exactly or every trace oracle hash drifts
    val events = Tables.events(spark, sfDir)
    val viaHelper = events.select(Tables.eventTimeUs(events).as("us")).agg(sum("us")).head().getLong(0)
    val viaCast = events.select(unix_micros(col("ts").cast("timestamp")).as("us"))
      .agg(sum("us")).head().getLong(0)
    assert(viaHelper === viaCast)
  }
}
