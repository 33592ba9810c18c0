package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream, OutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's packed-blob wire format (commons/packer/
  * PackedMessage.scala + Unpacker.scala): Cassandra trace blobs are
  * framed as
  *
  *   "hytc" | int32 metadataLen | {"t":"GZIP"} | compressed payload
  *
  * with GZIP / SNAPPY / ZSTD codecs (NONE writes the bare payload, no
  * frame). This module reproduces the frame byte-for-byte — magic,
  * big-endian length, the json4s-shaped metadata — over Spark's own
  * codec jars (java.util.zip, snappy-java, zstd-jni all ship with
  * Spark), so a store exported from the reference (blob column in
  * parquet/whatever) unpacks in a graft scan, and graft-written blobs
  * unpack with the reference's Unpacker. The payload stays
  * engine-specific (the reference packs a protobuf SpanBuffer; graft
  * packs whatever bytes the caller serialized) — the FRAME is the
  * interop contract, and PackedBlobSpec proves both directions
  * against hand-built reference-format bytes.
  */
object PackedBlob {

  val Magic: Array[Byte] = "hytc".getBytes(UTF_8)
  val Codecs: Set[String] = Set("GZIP", "SNAPPY", "ZSTD", "NONE")

  private def compressStream(codec: String, out: OutputStream): OutputStream = codec match {
    case "GZIP" => new GZIPOutputStream(out)
    case "SNAPPY" => new org.xerial.snappy.SnappyOutputStream(out)
    case "ZSTD" => new com.github.luben.zstd.ZstdOutputStream(out)
    case _ => null
  }

  private def decompressStream(codec: String, in: InputStream): Option[InputStream] = codec match {
    case "GZIP" => Some(new GZIPInputStream(in))
    case "SNAPPY" => Some(new org.xerial.snappy.SnappyInputStream(in))
    case "ZSTD" => Some(new com.github.luben.zstd.ZstdInputStream(in))
    case _ => None // reference Unpacker's `case _`: payload passes through
  }

  private def drain(in: InputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  /** Frame + compress `payload` under `codec` (reference Packer.apply +
    * PackedMessage.packedDataBytes). NONE = bare payload, no frame. */
  def pack(payload: Array[Byte], codec: String): Array[Byte] = {
    require(Codecs.contains(codec), s"unknown packed-blob codec: $codec")
    if (codec == "NONE") return payload
    val compressed = {
      val bytes = new ByteArrayOutputStream()
      val cs = compressStream(codec, bytes)
      cs.write(payload)
      cs.close()
      bytes.toByteArray
    }
    // json4s EnumSerializer shape the reference writes: {"t":"GZIP"}
    val metadata = s"""{"t":"$codec"}""".getBytes(UTF_8)
    ByteBuffer.allocate(Magic.length + 4 + metadata.length + compressed.length)
      .put(Magic).putInt(metadata.length).put(metadata).put(compressed).array()
  }

  /** Unframe + decompress (reference Unpacker.readSpanBuffer minus the
    * protobuf parse): bytes without the magic prefix come back as-is
    * (the NONE / pre-packer format). */
  def unpack(blob: Array[Byte]): Array[Byte] = {
    if (blob.length < Magic.length + 4 ||
      !Magic.indices.forall(i => blob(i) == Magic(i))) return blob
    val bb = ByteBuffer.wrap(blob)
    bb.position(Magic.length)
    val metadataLen = bb.getInt
    val metadata = new Array[Byte](metadataLen)
    bb.get(metadata)
    val codec = {
      // minimal parse of {"t":"..."} — the only shape the writer emits;
      // an unparseable metadata block degrades to pass-through like the
      // reference's `case _` (it only ever dispatches on known enum tags)
      val s = new String(metadata, UTF_8)
      """"t"\s*:\s*"([A-Z]+)"""".r.findFirstMatchIn(s).map(_.group(1)).getOrElse("NONE")
    }
    val offset = Magic.length + 4 + metadataLen
    val body = new ByteArrayInputStream(blob, offset, blob.length - offset)
    // Framed NONE / unrecognized codec: the reference Unpacker's `case _`
    // returns the bytes at the data offset rather than failing.
    decompressStream(codec, body).map(drain).getOrElse(drain(body))
  }
}

/** `pack_blob(payload, 'GZIP')` → framed blob (binary). */
case class PackBlob(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pack_blob"

  override protected def nullSafeEval(payload: Any, codec: Any): Any =
    PackedBlob.pack(payload.asInstanceOf[Array[Byte]], codec.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, c) => s"graft.functions.PackedBlob.pack($p, $c.toString())")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PackBlob =
    copy(left = newLeft, right = newRight)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) if right.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pack_blob requires (binary, literal string), got " +
            s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
}

object PackBlob {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PackBlob].getName, null, "pack_blob",
    "_FUNC_(payload, codec) - frame+compress payload in the reference packed-blob " +
      "wire format (codec: GZIP|SNAPPY|ZSTD|NONE).", "")
}

/** `unpack_blob(blob)` → original payload (binary). */
case class UnpackBlob(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "unpack_blob"

  override protected def nullSafeEval(blob: Any): Any =
    PackedBlob.unpack(blob.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.PackedBlob.unpack($b)")

  override protected def withNewChildInternal(newChild: Expression): UnpackBlob =
    copy(child = newChild)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unpack_blob requires binary input, got ${child.dataType.catalogString}")
}

object UnpackBlob {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[UnpackBlob].getName, null, "unpack_blob",
    "_FUNC_(blob) - unframe+decompress a reference packed-blob; bytes without " +
      "the magic prefix pass through unchanged.", "")
}
