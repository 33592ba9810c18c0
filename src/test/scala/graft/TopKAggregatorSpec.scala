package graft

import graft.functions.TopKAggregator
import graft.operators.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class TopKAggregatorSpec extends AnyFunSpec with Matchers with SparkTestBase {

  describe("TopKAggregator") {
    it("agrees with the window-rank top-k on the ANN scoring problem") {
      val s = spark
      import s.implicits._
      // same scored candidates the brute-force ANN produces…
      val n = VectorOps.withNorms(Tables.embeddings(spark, sfDir))
      val q = n.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))
      val scored = n.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"),
          round(VectorOps.dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 6).as("score"))

      // …ranked two ways: window row_number vs bounded-heap aggregation
      val windowed = VectorOps.annTopKBrute(Tables.embeddings(spark, sfDir), col("vec_id") < 5, 3)
        .collect()
        .groupBy(_.getAs[Long]("q_id"))
        .map { case (qid, rows) => qid -> rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("neighbor_id")).toSeq }

      val agged = scored.as[(Long, Long, Double)]
        .groupByKey(_._1)
        .agg(new TopKAggregator[(Long, Long, Double)](3, _._2, _._3).toColumn.name("topk"))
        .collect().toMap

      agged.keySet shouldBe windowed.keySet
      agged.foreach { case (qid, ids) => ids shouldBe windowed(qid) }
    }

    it("keeps at most k with deterministic tie-breaks") {
      val s = spark
      import s.implicits._
      val data = Seq((1L, 10L, 0.5), (1L, 3L, 0.5), (1L, 7L, 0.9), (1L, 4L, 0.1))
      val out = data.toDS().groupByKey(_._1)
        .agg(new TopKAggregator[(Long, Long, Double)](2, _._2, _._3).toColumn.name("topk"))
        .collect().head._2
      out shouldBe Seq(7L, 3L) // 0.9 first; 0.5 tie broken toward smaller id
    }
  }
}
