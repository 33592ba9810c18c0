package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class JsonTagsMapSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private def parse(jsons: String*): Seq[Map[String, String]] = {
    val s = spark
    import s.implicits._
    GraftExtensions.register(spark)
    jsons.toSeq.toDF("tags")
      .selectExpr("json_tags_map(tags) AS m")
      .collect()
      .map(r => if (r.isNullAt(0)) null else r.getMap[String, String](0).toMap)
      .toSeq
  }

  describe("json_tags_map") {
    it("lowercases keys with first value winning on case collisions") {
      parse("""{"Region": "us", "region": "eu", "K": "1"}""") shouldBe
        Seq(Map("region" -> "us", "k" -> "1"))
    }

    it("surfaces scalars as text and nested values as raw JSON") {
      val Seq(m) = parse("""{"n": 42, "b": true, "d": 1.5, "o": {"x": 1}, "a": [1, 2]}""")
      m("n") shouldBe "42"
      m("b") shouldBe "true"
      m("d") shouldBe "1.5"
      m("o") shouldBe """{"x":1}"""
      m("a") shouldBe "[1,2]"
    }

    it("returns null for malformed JSON and non-object roots") {
      parse("not json", "[1,2]", """"str"""") shouldBe Seq(null, null, null)
    }

    it("returns null (not a partial map) for truncated objects and trailing garbage") {
      parse("""{"region":"us",""", """{"region":"us"}garbage""",
        """{"region":"us","k":""") shouldBe Seq(null, null, null)
    }

    it("evaluates identically through codegen and interpreted paths") {
      val json = """{"A": "x", "a": "y", "n": 7}"""
      val viaExpr = parse(json).head
      val viaObj = {
        val m = graft.functions.JsonTagsMap.parse(
          org.apache.spark.unsafe.types.UTF8String.fromString(json))
        (0 until m.numElements()).map { i =>
          m.keyArray.getUTF8String(i).toString -> m.valueArray.getUTF8String(i).toString
        }.toMap
      }
      viaExpr shouldBe viaObj
    }

    it("rejects non-string input at analysis") {
      GraftExtensions.register(spark)
      assertThrows[Exception] {
        Tables.documents(spark, sfDir).selectExpr("json_tags_map(doc_id)").collect()
      }
    }
  }
}
