package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature as one codegen'd Catalyst expression:
  * `minhash_sig(shingles, n)` → `array<bigint>` of the n per-seed
  * minima over the document's distinct shingle set.
  *
  * Bit-identical to the declarative build in the dedup_minhash query
  * (seeded hash = first 8 md5 hex chars of "j:shingle" as a long,
  * `MIN(CASE WHEN j=… THEN h END)` per seed) and to its DuckDB oracle.
  * The declarative path explodes shingles × seeds — n rows per
  * (doc, shingle) — then shuffles them into an n-column aggregation;
  * this expression computes the whole signature inside the scan stage,
  * so nothing shuffles until LSH band bucketing. At 10^9 documents
  * that removes the dominant exchange of the minhash pipeline.
  *
  * Null/empty shingle arrays yield null (the declarative explode drops
  * such docs; callers filter them first).
  */
case class MinHashSig(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  // compute() yields null for empty/all-null shingle arrays even when
  // the child is non-nullable — declare it, or codegen marks the slot
  // non-nullable and downstream IsNull folds to a wrong constant
  override def nullable: Boolean = true

  override protected def nullSafeEval(shingles: Any, n: Any): Any =
    MinHashSig.compute(shingles.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) => s"""
      |${ev.value} = graft.functions.MinHashSig.compute($a, $n);
      |if (${ev.value} == null) {
      |  ${ev.isNull} = true;
      |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires (array<string>, literal int), got " +
            s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
}

object MinHashSig {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes of "seed:shingle" as a big-endian long —
    * identical to CAST(('0x' || substr(md5(j || ':' || s), 1, 8)) AS
    * BIGINT). */
  def seededHash(seed: Int, shingle: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    d.update(String.valueOf(seed).getBytes)
    d.update(':'.toByte)
    val h = d.digest(shingle.getBytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  def compute(shingles: ArrayData, n: Int): ArrayData = {
    val len = shingles.numElements()
    if (len == 0) return null
    val seen = new java.util.HashSet[UTF8String](Math.max(16, len * 2))
    val mins = Array.fill(n)(Long.MaxValue)
    var i = 0
    var any = false
    while (i < len) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        if (seen.add(s)) {
          any = true
          var j = 0
          while (j < n) {
            val h = seededHash(j, s)
            if (h < mins(j)) mins(j) = h
            j += 1
          }
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashSig].getName, null, "minhash_sig",
    "_FUNC_(shingles, n) - n-element MinHash signature (per-seed minima " +
      "of md5-prefix hashes) over the distinct shingle set.", "")
}
