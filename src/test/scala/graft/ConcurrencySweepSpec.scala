package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Cross-checks the trace_concurrency sweep line against a brute-force
  * driver-side count: for every span-start instant, how many spans'
  * [start, end] intervals cover it. The sweep's MAX must equal the
  * brute maximum (peaks occur at starts; the sweep's end-before-start
  * tie rule means an interval is counted as closed at its end instant,
  * so coverage uses [start, end)). */
class ConcurrencySweepSpec extends AnyFunSpec with Matchers with SparkTestBase {

  it("sweep-line peak equals the brute-force interval-stabbing maximum") {
    val rows = graft.operators.SpanOps
      .spansFromEvents(Tables.events(spark, sfDir))
      .select("service", "start_us", "duration_us")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(1) + r.getLong(2)))

    val brute: Map[String, Int] = rows.groupBy(_._1).map { case (svc, sp) =>
      svc -> sp.map { case (_, t, _) =>
        sp.count { case (_, s, e) => s <= t && t < e }
      }.max
    }

    val got = SparkEntry.allDefs("trace_concurrency").fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    got.keySet shouldBe brute.keySet
    got.foreach { case (svc, peak) => peak shouldBe brute(svc).toLong }
  }
}
