package graft.streaming

import graft.model.Span
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka source/sink wiring for the span stream (SURVEY.md §2 A23) —
  * the Spark analogue of the reference indexer's consumer config +
  * `serde/SpanDeserializer.scala` and `writers/kafka/KafkaWriter.scala`.
  *
  * Split so everything except the literal `.format("kafka").load()` is
  * compiled AND tested offline:
  *  - [[KafkaSourceConfig]]/[[KafkaSinkConfig]] build the option maps
  *    (pure, spec-tested);
  *  - [[deserializeSpans]] turns the Kafka wire schema (key/value
  *    binary + metadata) into a typed `Dataset[Span]` — spec-tested on
  *    a static DataFrame with the exact source schema;
  *  - [[readSpanStream]]/[[writeSpanStream]] glue those onto
  *    readStream/writeStream — compiled here, but the connector jar is
  *    not in the offline image, so they are exercised only in an
  *    environment that ships spark-sql-kafka.
  *
  * Wire format: the reference moves protobuf `Span` bytes; protobuf
  * codegen isn't available offline, so the value payload is the span as
  * a JSON object with the [[Span]] field names — the deserializer is
  * the single place a protobuf decoder would slot in.
  */
object KafkaSpanSource {

  /** Consumer wiring (reference indexer kafka config block: bootstrap
    * servers, topic, consumer group, offset reset). */
  final case class KafkaSourceConfig(
      bootstrapServers: String,
      topic: String,
      consumerGroup: String = "graft-span-indexer",
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = false) {
    def options: Map[String, String] =
      Map(
        "kafka.bootstrap.servers" -> bootstrapServers,
        "subscribe" -> topic,
        "kafka.group.id" -> consumerGroup,
        "startingOffsets" -> startingOffsets,
        "failOnDataLoss" -> failOnDataLoss.toString) ++
        maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)
  }

  /** Producer wiring (reference KafkaWriter: emits the sealed buffer
    * back to a topic keyed by traceId). */
  final case class KafkaSinkConfig(
      bootstrapServers: String,
      topic: String,
      checkpointDir: String) {
    def options: Map[String, String] = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "topic" -> topic,
      "checkpointLocation" -> checkpointDir)
  }

  /** JSON schema of the value payload — Span's fields. */
  val spanSchema: StructType = StructType(Seq(
    StructField("traceId", StringType),
    StructField("spanId", StringType),
    StructField("parentSpanId", StringType),
    StructField("service", StringType),
    StructField("operation", StringType),
    StructField("startUs", LongType),
    StructField("durationUs", LongType),
    StructField("kind", StringType),
    StructField("tags", MapType(StringType, StringType))))

  /** Kafka wire rows (key/value binary + topic/partition/offset/
    * timestamp — the exact schema `format("kafka")` loads) → typed
    * spans. Malformed payloads and null-traceId rows are dropped, the
    * streaming analogue of the reference deserializer returning null on
    * a protobuf parse failure and the processor skipping it. */
  def deserializeSpans(kafkaRows: DataFrame): Dataset[Span] = {
    val s = kafkaRows.sparkSession
    import s.implicits._
    kafkaRows
      .select(from_json(col("value").cast("string"), spanSchema).as("span"))
      .select(
        col("span.traceId").as("traceId"),
        col("span.spanId").as("spanId"),
        coalesce(col("span.parentSpanId"), lit("")).as("parentSpanId"),
        coalesce(col("span.service"), lit("")).as("service"),
        coalesce(col("span.operation"), lit("")).as("operation"),
        coalesce(col("span.startUs"), lit(0L)).as("startUs"),
        coalesce(col("span.durationUs"), lit(0L)).as("durationUs"),
        coalesce(col("span.kind"), lit("")).as("kind"),
        coalesce(col("span.tags"), map()).as("tags"))
      .filter(col("traceId").isNotNull && col("spanId").isNotNull)
      .as[Span]
  }

  /** Span → Kafka record projection (key = traceId so one trace lands
    * in one partition, preserving the reference's partition-by-trace
    * sharding; value = JSON payload). Shared by the streaming sink and
    * any batch backfill write. */
  def serializeSpans(spans: Dataset[Span]): DataFrame =
    spans.select(
      col("traceId").cast("binary").as("key"),
      to_json(struct(spans.columns.map(col).toIndexedSeq: _*)).cast("binary").as("value"))

  /** Live consumer: requires the spark-sql-kafka connector on the
    * classpath (absent from the offline image). */
  def readSpanStream(spark: SparkSession, config: KafkaSourceConfig): Dataset[Span] =
    deserializeSpans(
      config.options.foldLeft(spark.readStream.format("kafka")) {
        case (r, (k, v)) => r.option(k, v)
      }.load())

  /** Live producer for any streaming span set (e.g. processed spans
    * flowing back out, the KafkaWriter analogue). Folds the
    * spec-tested option map, like [[readSpanStream]], so options added
    * to [[KafkaSinkConfig.options]] reach the writer. */
  def writeSpanStream(spans: Dataset[Span], config: KafkaSinkConfig) =
    config.options.foldLeft(serializeSpans(spans).writeStream.format("kafka")) {
      case (w, (k, v)) => w.option(k, v)
    }
}
