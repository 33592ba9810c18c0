package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Count-Min term-frequency sketch (text_top_terms_approx): CMS can
  * only OVERcount (hash collisions add, never subtract), and the
  * standard bound holds with high probability: est ≤ exact + eps·N.
  */
class CountMinSpec extends AnyFunSpec with Matchers with SparkTestBase {

  describe("count-min term frequencies") {
    it("never undercounts and stays within the eps bound on every probed term") {
      val eps = 0.001
      val terms = Tables.documents(spark, sfDir)
        .select(explode(split(trim(col("text")), "\\s+")).as("term"))
      val total = terms.count()
      val sketch = terms.stat.countMinSketch("term", eps = eps, confidence = 0.99, seed = 42)
      val top = terms.groupBy("term").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term")).limit(50).collect()
      top.length should be > 0
      top.foreach { r =>
        val (term, exact) = (r.getString(0), r.getLong(1))
        val est = sketch.estimateCount(term)
        withClue(s"term '$term' exact=$exact est=$est: ") {
          est should be >= exact // CMS is an overestimate by construction
          est.toDouble should be <= exact + eps * total
        }
      }
    }

    it("is deterministic for a fixed seed (merge order can't change estimates)") {
      val terms = Tables.documents(spark, sfDir)
        .select(explode(split(trim(col("text")), "\\s+")).as("term"))
      val a = terms.stat.countMinSketch("term", eps = 0.001, confidence = 0.99, seed = 42)
      val b = terms.repartition(7).stat
        .countMinSketch("term", eps = 0.001, confidence = 0.99, seed = 42)
      val probes = terms.distinct().limit(30).collect().map(_.getString(0))
      probes.foreach { t => a.estimateCount(t) shouldBe b.estimateCount(t) }
    }
  }
}
