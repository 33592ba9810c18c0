package graft

import graft.functions.FnvHash64
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class FnvHash64Spec extends AnyFunSpec with Matchers with SparkTestBase {

  describe("FnvHash64") {
    it("matches the FNV-1a reference vectors") {
      // published FNV-1a 64 test vectors (public domain algorithm spec)
      FnvHash64.hash("".getBytes("UTF-8")) shouldBe 0xcbf29ce484222325L
      FnvHash64.hash("a".getBytes("UTF-8")) shouldBe 0xaf63dc4c8601ec8cL
      FnvHash64.hash("foobar".getBytes("UTF-8")) shouldBe 0x85944171f73967e8L
    }

    it("evaluates identically through codegen and the object method") {
      GraftExtensions.register(spark)
      val docs = Tables.documents(spark, sfDir).limit(20)
      val viaExpr = docs.selectExpr("doc_id", "fnv_hash64(text) AS fp")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaObj = docs.select("doc_id", "text")
        .collect().map(r => r.getLong(0) -> FnvHash64.hash(r.getString(1).getBytes("UTF-8"))).toMap
      viaExpr shouldBe viaObj
    }

    it("stays inside whole-stage codegen") {
      GraftExtensions.register(spark)
      val plan = Tables.documents(spark, sfDir)
        .selectExpr("fnv_hash64(text) AS fp")
        .queryExecution.executedPlan.toString
      // the "*(n)" prefix marks operators fused into whole-stage codegen
      plan should include("*(1) Project [fnv_hash64")
    }

    it("rejects non-string input at analysis") {
      GraftExtensions.register(spark)
      assertThrows[Exception] {
        Tables.documents(spark, sfDir).selectExpr("fnv_hash64(doc_id)").collect()
      }
    }
  }
}
