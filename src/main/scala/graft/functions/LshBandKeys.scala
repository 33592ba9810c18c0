package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native banded-LSH bucket keys as one codegen'd Catalyst expression:
  * `lsh_band_keys(v, bitsPerBand, bands)` → `array<string>` of `bands`
  * keys, each `"<band>:"` + that band's hyperplane sign bits.
  *
  * WHY an expression and not a Column tree: the declarative form is
  * bands × bitsPerBand plane dots, each a 64-term sum — at 6 bands ×
  * 5 bits that is a ~1.9k-node expression whose generated Java exceeds
  * the JVM's 64 KB method limit. Janino then fails, Spark re-attempts
  * the compile and falls back to interpreted eval, and the query pays
  * ~5 s of fixed compile+interpret cost REGARDLESS of row count
  * (measured at sf0.1: 5.9 s for 300 rows). This expression is one
  * static call, so whole-stage codegen stays intact and the per-row
  * cost is the arithmetic itself.
  *
  * Bit-identical to the declarative chain and the SQL oracle: weights
  * come from [[graft.operators.VectorOps.lshWeights]] (the single
  * formula source), and each plane dot accumulates left-to-right in
  * index order — the same IEEE additions as the left-associated
  * `reduce(_ + _)` Column chain and the literal SQL chain, so sign
  * bits (and therefore buckets and candidate pairs) cannot drift.
  */
case class LshBandKeys(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"

  override protected def nullSafeEval(v: Any, bitsPerBand: Any, bands: Any): Any =
    LshBandKeys.compute(v.asInstanceOf[ArrayData],
      bitsPerBand.asInstanceOf[Int], bands.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, b, n) => s"graft.functions.LshBandKeys.compute($v, $b, $n)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LshBandKeys =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType, IntegerType)
        if second.foldable && third.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_band_keys requires (array<double>, literal int, literal int), got " +
            s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
            s"${third.dataType.catalogString})")
    }
}

object LshBandKeys {

  // weights are deterministic in (planeCount, dim); cache the boxed-free
  // form so the hot loop reads primitive arrays
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def weights(dim: Int, planes: Int): Array[Array[Double]] =
    cache.computeIfAbsent((dim, planes),
      _ => graft.operators.VectorOps.lshWeights(dim, planes).map(_.toArray).toArray)

  /** All band keys for one vector; see class doc for the exactness
    * contract. Inputs must be containsNull=false arrays: ArrayData.getDouble
    * on a null slot reads 0.0 (the slot silently drops out of the dot
    * product), whereas the declarative Column chain would null-propagate
    * the whole sum and `when(null >= 0)` would emit a '0' bit — the two
    * paths diverge on null-containing vectors, so we don't accept them
    * (the embeddings table and every caller produce dense non-null
    * arrays; LshBandKeysSpec pins native ≡ declarative on that domain). */
  def compute(v: ArrayData, bitsPerBand: Int, bands: Int): ArrayData = {
    val dim = v.numElements()
    val ws = weights(dim, bitsPerBand * bands)
    val out = new Array[Any](bands)
    var j = 0
    while (j < bands) {
      val sb = new java.lang.StringBuilder(bitsPerBand + 4)
      sb.append(j).append(':')
      var b = 0
      while (b < bitsPerBand) {
        val w = ws(j * bitsPerBand + b)
        var s = 0.0
        var i = 0
        while (i < dim) { s += v.getDouble(i) * w(i); i += 1 }
        sb.append(if (s >= 0) '1' else '0')
        b += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[LshBandKeys].getName, null, "lsh_band_keys",
    "_FUNC_(v, bitsPerBand, bands) - banded random-hyperplane LSH bucket " +
      "keys ('<band>:' + sign bits) of a double vector.", "")
}
