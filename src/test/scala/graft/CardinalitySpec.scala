package graft

import graft.operators.SpanOps
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Error bound for the HLL sketch surface (trace_service_cardinality):
  * approx_count_distinct's default rsd is 5%; on real data the
  * per-service estimates must stay within a conservative 10% of exact
  * (and be exact at the tiny cardinalities HLL's sparse mode covers).
  */
class CardinalitySpec extends AnyFunSpec with Matchers with SparkTestBase {

  describe("trace_service_cardinality") {
    it("bounds sketch error against exact distinct counts") {
      val sp = SpanOps.spansFromEvents(Tables.events(spark, sfDir))
      val approx = sp.groupBy("service")
        .agg(approx_count_distinct("operation").as("ao"),
          approx_count_distinct("trace_id").as("at"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val exact = sp.groupBy("service")
        .agg(countDistinct("operation").as("eo"), countDistinct("trace_id").as("et"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      exact.keySet shouldBe approx.keySet
      exact.foreach { case (svc, (eo, et)) =>
        val (ao, at) = approx(svc)
        math.abs(ao - eo).toDouble / eo should be <= 0.1
        math.abs(at - et).toDouble / et should be <= 0.1
      }
    }
  }
}
