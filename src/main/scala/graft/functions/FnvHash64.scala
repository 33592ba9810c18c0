package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit FNV-1a hash as a Catalyst expression with codegen —
  * the preferred extension path for scalar functions (a JVM lambda UDF
  * would break whole-stage codegen; this stays inside it).
  *
  * Used for document fingerprinting / shingle hashing where a stable,
  * cheap 64-bit hash beats md5-hex-substring gymnastics at 100 TB scale
  * (8 bytes/row, one pass, no hex strings).
  */
case class FnvHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "fnv_hash64"

  override protected def nullSafeEval(input: Any): Any =
    FnvHash64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FnvHash64.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): FnvHash64 =
    copy(child = newChild)

  // UnaryExpression's default checkInputDataTypes accepts any type; pin it
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fnv_hash64 requires a string argument, got ${child.dataType.catalogString}")
}

object FnvHash64 {
  final val OffsetBasis = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  /** FNV-1a over raw bytes (public-domain algorithm). */
  def hash(bytes: Array[Byte]): Long = {
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[FnvHash64].getName, null, "fnv_hash64",
    "_FUNC_(str) - 64-bit FNV-1a hash of the UTF-8 bytes of str.", "")
}
