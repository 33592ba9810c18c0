package graft

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import graft.functions.PackedBlob
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Wire-format interop with the reference's packed Cassandra blobs
  * (commons/packer/PackedMessage.scala, Unpacker.scala): frame =
  * "hytc" + int32 len + {"t":CODEC} + compressed payload.
  */
class PackedBlobSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private val payload = ("span buffer payload " * 20).getBytes(UTF_8)

  describe("PackedBlob") {
    it("round-trips every codec") {
      for (codec <- Seq("GZIP", "SNAPPY", "ZSTD", "NONE")) {
        PackedBlob.unpack(PackedBlob.pack(payload, codec)).toSeq shouldBe payload.toSeq
      }
    }

    it("frames exactly like the reference PackedMessage") {
      val blob = PackedBlob.pack(payload, "GZIP")
      blob.slice(0, 4) shouldBe "hytc".getBytes(UTF_8)
      val metaLen = ByteBuffer.wrap(blob, 4, 4).getInt
      new String(blob.slice(8, 8 + metaLen), UTF_8) shouldBe """{"t":"GZIP"}"""
    }

    it("unpacks bytes a reference writer would produce") {
      // build the frame by hand exactly as PackedMessage.packedDataBytes
      // does: magic | int32 len | json4s metadata | GZIPOutputStream data
      val compressed = {
        val bytes = new ByteArrayOutputStream()
        val gz = new GZIPOutputStream(bytes)
        gz.write(payload); gz.close()
        bytes.toByteArray
      }
      val metadata = """{"t":"GZIP"}""".getBytes(UTF_8)
      val referenceBlob = ByteBuffer
        .allocate(4 + 4 + metadata.length + compressed.length)
        .put("hytc".getBytes(UTF_8)).putInt(metadata.length)
        .put(metadata).put(compressed).array()
      PackedBlob.unpack(referenceBlob).toSeq shouldBe payload.toSeq
    }

    it("passes unframed bytes through (pre-packer / NONE format)") {
      PackedBlob.unpack(payload).toSeq shouldBe payload.toSeq
      PackedBlob.pack(payload, "NONE").toSeq shouldBe payload.toSeq
    }

    it("NONE output carries no frame, like the reference NoopPacker") {
      PackedBlob.pack(payload, "NONE").slice(0, 4) should not be "hytc".getBytes(UTF_8).toSeq
    }

    it("rejects unknown codecs at pack time") {
      an[IllegalArgumentException] should be thrownBy PackedBlob.pack(payload, "LZ4")
    }

    it("tolerates framed NONE / unrecognized codecs like the reference Unpacker's case _") {
      // the reference writer never emits these today, but its reader
      // returns the bytes at the data offset — match that tolerance
      for (metaJson <- Seq("""{"t":"NONE"}""", """{"t":"LZ4FUTURE"}""", """{"v":2}""")) {
        val metadata = metaJson.getBytes(UTF_8)
        val framed = ByteBuffer
          .allocate(4 + 4 + metadata.length + payload.length)
          .put("hytc".getBytes(UTF_8)).putInt(metadata.length)
          .put(metadata).put(payload).array()
        PackedBlob.unpack(framed).toSeq shouldBe payload.toSeq
      }
    }

    it("round-trips arbitrary payloads (fixed-seed property)") {
      // deterministic generator style matching TraceTransformsPropertySpec
      // (no scalatest-scalacheck bridge in the offline cache)
      val rnd = new scala.util.Random(0xb10b5eed)
      for (_ <- 1 to 50; codec <- Seq("GZIP", "SNAPPY", "ZSTD", "NONE")) {
        val bytes = new Array[Byte](rnd.nextInt(4096))
        rnd.nextBytes(bytes)
        PackedBlob.unpack(PackedBlob.pack(bytes, codec)).toSeq shouldBe bytes.toSeq
      }
    }
  }

  describe("pack_blob / unpack_blob expressions") {
    it("round-trip inside a plan, per codec, with codegen") {
      GraftExtensions.register(spark)
      val s = spark
      import s.implicits._
      val df = Seq(("a", "payload-one"), ("b", "payload-two" * 50))
        .toDF("id", "text")
        .selectExpr("id", "cast(text AS BINARY) AS data")
      for (codec <- Seq("GZIP", "SNAPPY", "ZSTD")) {
        val out = df.selectExpr("id",
          s"unpack_blob(pack_blob(data, '$codec')) AS back", "data")
          .filter(expr("back = data"))
        out.count() shouldBe 2
        // and the packed form really is framed
        df.selectExpr(s"pack_blob(data, '$codec') AS blob")
          .filter(expr("substring(blob, 1, 4) = cast('hytc' AS BINARY)"))
          .count() shouldBe 2
      }
    }
  }
}
