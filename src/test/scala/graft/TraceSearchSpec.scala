package graft

import graft.operators.TraceSearch
import graft.operators.TraceSearch._
import graft.operators.WhitelistIndex.WhitelistField
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Range-flag enforcement on the expression-tree search — the Spark
  * analogue of the reference rejecting range filters on fields whose
  * ES mapping was not range-indexed (commons
  * config/entities/WhitelistIndexFieldConfiguration.scala).
  */
class TraceSearchSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private val whitelist = Seq(
    WhitelistField("kval", "long", aliases = Seq("k"), enableRangeQuery = true),
    WhitelistField("region", "string"),
    WhitelistField("iserror", "boolean", aliases = Seq("err")))

  private def taggedSpans = {
    val s = spark
    import s.implicits._
    Seq(
      ("t1", 1L, """{"k": "95", "region": "EU", "err": "true"}""", 100L),
      ("t1", 2L, """{"k": "10", "region": "US", "err": "false"}""", 200L),
      ("t2", 3L, """{"k": "99", "region": "EU", "err": "false"}""", 300L))
      .toDF("trace_id", "span_id", "tags", "start_us")
  }

  describe("validateRangeFields") {
    it("accepts a range on a range-enabled whitelist field and finds the traces") {
      val out = TraceSearch.matchingTraceIdsTagged(taggedSpans,
        Seq(And(Seq(RangeUs("kval", 90, 100), RangeUs("start_us", 0, 1000)))),
        whitelist).collect().map(_.getString(0)).sorted.toSeq
      out shouldBe Seq("t1", "t2")
    }

    it("rejects a range on a whitelist field without enableRangeQuery, before any plan builds") {
      val ex = intercept[IllegalArgumentException] {
        TraceSearch.matchingTraceIdsTagged(taggedSpans,
          Seq(RangeUs("region", 0, 10)), whitelist)
      }
      ex.getMessage should include("region")
      ex.getMessage should include("enableRangeQuery")
    }

    it("rejects range predicates nested anywhere in the boolean tree") {
      val ex = intercept[IllegalArgumentException] {
        TraceSearch.validateRangeFields(
          Seq(And(Seq(Eq("region", "EU"),
            Or(Seq(Not(RangeUs("iserror", 0, 1)), Eq("kval", "5")))))),
          whitelist)
      }
      ex.getMessage should include("iserror")
    }

    it("always admits ranges on the intrinsic numeric span fields") {
      noException should be thrownBy TraceSearch.validateRangeFields(
        Seq(RangeUs("start_us", 0, 10), RangeUs("duration_us", 0, 10)), whitelist)
    }

    it("equality predicates are never range-gated (keyword mappings serve them)") {
      noException should be thrownBy TraceSearch.validateRangeFields(
        Seq(Eq("region", "EU"), Eq("iserror", "true")), whitelist)
    }
  }
}
