package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 48-bit SimHash over a token array as a single codegen'd
  * Catalyst expression — the whole signature in one map-side pass.
  *
  * Bit-identical to the declarative build in
  * [[graft.operators.TextOps.simHash]] (distinct tokens → 48-bit
  * md5-prefix token hash → per-bit ±1 votes → sign bits), and
  * therefore to the DuckDB oracle SQL. The declarative path needs an
  * explode plus a 48-column aggreation — a shuffle of one row per
  * (doc, token). This expression keeps signature computation entirely
  * inside the scan stage: zero shuffle until candidate banding, which
  * is the shape that matters at 10^9 documents.
  *
  * 48 bits (not 64) so votes and shifts stay in exact long range with
  * the md5-hex-substring oracle mirror (see TextOps.SimHashBits).
  */
case class SimHash48(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash48"

  // compute() yields null when the array holds no tokens (matching the
  // declarative path, whose explode emits no row for that doc) — even
  // when the child itself is non-nullable
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SimHash48.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |java.lang.Long ${ev.value}_boxed = graft.functions.SimHash48.compute($c);
      |if (${ev.value}_boxed == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}_boxed.longValue();
      |}""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash48 requires array<string>, got ${other.catalogString}")
    }
}

object SimHash48 {

  final val Bits = 48

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 6 md5 bytes as a big-endian 48-bit long — identical to
    * CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT). */
  def tokenHash48(token: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(token.getBytes)
    ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) | ((h(2) & 0xffL) << 24) |
      ((h(3) & 0xffL) << 16) | ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
  }

  /** Signature of one document's token array (null tokens skipped,
    * duplicate tokens voted once — the array_distinct of the
    * declarative build). Returns null when NO token voted
    * (empty/all-null array): the declarative explode emits no row for
    * such a doc, so a 0L here would invent hamming-0 "near-duplicate"
    * pairs between all empty docs. */
  def compute(tokens: ArrayData): java.lang.Long = {
    val n = tokens.numElements()
    val seen = new java.util.HashSet[UTF8String](Math.max(16, n * 2))
    val votes = new Array[Int](Bits)
    var any = false
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val tok = tokens.getUTF8String(i)
        if (seen.add(tok)) {
          any = true
          val h = tokenHash48(tok)
          var b = 0
          while (b < Bits) {
            votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
      }
      i += 1
    }
    if (!any) return null
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimHash48].getName, null, "simhash48",
    "_FUNC_(tokens) - 48-bit SimHash of an array<string> token set " +
      "(md5-prefix token hashes, per-bit majority vote).", "")
}
