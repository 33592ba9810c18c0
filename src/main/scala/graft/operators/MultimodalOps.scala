package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2 B12): image/audio/video as
  * opaque `binary` payloads + typed metadata, processed in
  * partition-local batches.
  *
  * The actual codecs are NOT in this offline image, so the decode step
  * is a clearly-marked deterministic stub ([[stubDecode]]); everything
  * around it — schema, batching, partition-local iteration, output
  * shape — is the real production plumbing. Swapping the stub for a
  * JNI/codec call (or moving the stage to `mapInPandas` in a PySpark
  * deployment with PIL/ffmpeg) changes one function.
  *
  * Scale: payloads never shuffle — decode/feature-extract run in the
  * scan's own partitions (`mapPartitions`), so the expensive bytes move
  * zero times; only the small feature rows flow downstream.
  */
object MultimodalOps {

  /** Typed media row: payload + metadata travelling together. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("source", StringType, nullable = true)))

  /** Deterministic fake of a codec: "decodes" dimensions/duration from
    * payload bytes. STUB — replace with a real decoder off-image. */
  def stubDecode(mediaType: String, payload: Array[Byte]): (Int, Int, Double) = {
    val n = payload.length
    val h = java.util.Arrays.hashCode(payload)
    mediaType match {
      case "image" => (512 + math.abs(h % 1024), 512 + math.abs((h / 1024) % 1024), 0.0)
      case "audio" => (1, 0, n / 16000.0) // "samples at 16kHz"
      case "video" => (640, 480, n / 1e5)
      case _ => (0, 0, 0.0)
    }
  }

  /** Synthetic media table derived from `documents` (texts as payload
    * bytes) — stands in for a real binary-column source so the
    * pipeline is exercisable in tests. */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source"))

  /** Decode + feature-extract, batched per partition. Output: one small
    * feature row per media item; payload is dropped before any shuffle. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("duration_s", DoubleType, nullable = false),
      StructField("byte_entropy", DoubleType, nullable = false)))
    val rdd = media.select("media_id", "media_type", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val mt = r.getString(1)
        val payload = r.getAs[Array[Byte]](2)
        val (w, h, dur) = stubDecode(mt, payload)
        Row(id, mt, payload.length.toLong, w, h, dur, byteEntropy(payload))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Shannon entropy of the byte histogram — a real (non-stub) feature
    * usable for corrupt-file and compression screening. */
  def byteEntropy(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) return 0.0
    val counts = new Array[Long](256)
    bytes.foreach(b => counts(b & 0xff) += 1)
    val n = bytes.length.toDouble
    var e = 0.0
    counts.foreach { c =>
      if (c > 0) { val p = c / n; e -= p * math.log(p) / math.log(2) }
    }
    e
  }

  /** Frame sampling for video payloads: fixed-count byte-window slices
    * standing in for decoded frames (the sampling STRATEGY — uniform
    * temporal stride, bounded frames per item — is the real logic). */
  def sampleFrames(media: DataFrame, nFrames: Int, frameBytes: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val rdd = media.filter(col("media_type") === "video")
      .select("media_id", "payload").rdd.mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          if (payload.isEmpty) Iterator.empty
          else {
            val stride = math.max(1, payload.length / nFrames)
            (0 until math.min(nFrames, payload.length)).iterator.map { i =>
              val from = i * stride
              val until = math.min(from + frameBytes, payload.length)
              Row(id, i, java.util.Arrays.copyOfRange(payload, from, math.max(from + 1, until)))
            }
          }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }
}
