package graft

import graft.model.Span
import graft.streaming.KafkaSpanSource
import graft.streaming.KafkaSpanSource.{KafkaSinkConfig, KafkaSourceConfig}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class KafkaSpanSourceSpec extends AnyFunSpec with Matchers with SparkTestBase {

  /** The exact schema `spark.readStream.format("kafka").load()` yields. */
  private val kafkaWireSchema = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  private def wireRows(payloads: String*) = {
    val rows = payloads.zipWithIndex.map { case (p, i) =>
      Row("k".getBytes, p.getBytes("UTF-8"), "proto-spans", 0, i.toLong,
        new java.sql.Timestamp(0L), 0)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), kafkaWireSchema)
  }

  describe("deserializeSpans") {
    it("decodes a well-formed payload into a typed Span") {
      val json = """{"traceId":"t1","spanId":"s1","parentSpanId":"p1",
        |"service":"svc","operation":"op","startUs":1000,"durationUs":50,
        |"kind":"client","tags":{"a":"1"}}""".stripMargin.replace("\n", "")
      val out = KafkaSpanSource.deserializeSpans(wireRows(json)).collect()
      out shouldBe Array(
        Span("t1", "s1", "p1", "svc", "op", 1000L, 50L, "client", Map("a" -> "1")))
    }

    it("defaults optional fields and drops malformed payloads") {
      val minimal = """{"traceId":"t1","spanId":"s1","startUs":5}"""
      val garbage = "not json at all"
      val missingIds = """{"service":"svc"}"""
      val out = KafkaSpanSource.deserializeSpans(
        wireRows(minimal, garbage, missingIds)).collect()
      out should have length 1
      out.head shouldBe Span("t1", "s1", "", "", "", 5L, 0L, "", Map.empty)
    }

    it("round-trips through serializeSpans") {
      val s = spark
      import s.implicits._
      val spans = Seq(
        Span("t1", "a", "", "svc", "op", 1L, 2L, "server", Map("x" -> "y")),
        Span("t2", "b", "a", "svc2", "op2", 3L, 4L, "", Map.empty))
      val wire = KafkaSpanSource.serializeSpans(spans.toDS())
        .withColumn("topic", org.apache.spark.sql.functions.lit("t"))
        .withColumn("partition", org.apache.spark.sql.functions.lit(0))
        .withColumn("offset", org.apache.spark.sql.functions.lit(0L))
        .withColumn("timestamp",
          org.apache.spark.sql.functions.lit(new java.sql.Timestamp(0L)))
        .withColumn("timestampType", org.apache.spark.sql.functions.lit(0))
      KafkaSpanSource.deserializeSpans(wire).collect().toSet shouldBe spans.toSet
    }

    it("keys records by traceId so a trace shards to one partition") {
      val s = spark
      import s.implicits._
      val keys = KafkaSpanSource.serializeSpans(
        Seq(Span("t9", "a", "", "", "", 0L, 0L, "", Map.empty)).toDS())
        .select("key").collect().map(r => new String(r.getAs[Array[Byte]](0)))
      keys shouldBe Array("t9")
    }
  }

  describe("configs") {
    it("builds the consumer option map the kafka source expects") {
      val opts = KafkaSourceConfig("broker:9092", "proto-spans",
        maxOffsetsPerTrigger = Some(50000L)).options
      opts("kafka.bootstrap.servers") shouldBe "broker:9092"
      opts("subscribe") shouldBe "proto-spans"
      opts("startingOffsets") shouldBe "latest"
      opts("maxOffsetsPerTrigger") shouldBe "50000"
      opts("failOnDataLoss") shouldBe "false"
    }

    it("builds the producer option map") {
      val opts = KafkaSinkConfig("broker:9092", "span-buffers", "/tmp/ck").options
      opts("topic") shouldBe "span-buffers"
      opts("checkpointLocation") shouldBe "/tmp/ck"
    }
  }
}
