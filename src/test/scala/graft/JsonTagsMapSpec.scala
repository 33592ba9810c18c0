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

    it("matches a reference Scala parse over randomized flat objects") {
      val rnd = new scala.util.Random(7)
      def randKey() = {
        val base = Seq("region", "K", "Status", "x1", "UP", "mix3")(rnd.nextInt(6))
        if (rnd.nextBoolean()) base.toUpperCase else base
      }
      def randValue(): (String, String) = rnd.nextInt(4) match {
        case 0 => val n = rnd.nextInt(1000); (n.toString, n.toString)
        case 1 => val b = rnd.nextBoolean(); (b.toString, b.toString)
        case 2 => val s = "s" + rnd.nextInt(100); ("\"" + s + "\"", s)
        case _ => ("null", null)
      }
      val cases = (1 to 60).map { _ =>
        val fields = (0 until rnd.nextInt(5)).map { _ =>
          val k = randKey(); val (jv, pv) = randValue(); (k, jv, pv)
        }
        val json = fields.map { case (k, jv, _) => s""""$k": $jv""" }.mkString("{", ", ", "}")
        val expected = fields.foldLeft(Map.empty[String, String]) { case (m, (k, _, pv)) =>
          val lk = k.toLowerCase(java.util.Locale.ROOT)
          if (m.contains(lk)) m else m + (lk -> pv)
        }
        json -> expected
      }
      // value "null" entries: the map stores a null value for the key
      parse(cases.map(_._1): _*).zip(cases.map(_._2)).foreach { case (got, want) =>
        got shouldBe want
      }
    }

    it("rejects non-string input at analysis") {
      GraftExtensions.register(spark)
      assertThrows[Exception] {
        Tables.documents(spark, sfDir).selectExpr("json_tags_map(doc_id)").collect()
      }
    }
  }
}
