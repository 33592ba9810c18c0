package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded-LSH bucket keys with an ORACLE-EXPRESSIBLE weight family —
  * the corpus-size-dialed sibling of [[LshBandKeys]].
  *
  * [[LshBandKeys]] draws its hyperplanes from MurmurHash3, which an SQL
  * oracle can only replay as pre-rendered LITERALS — fine while
  * bitsPerBand is fixed, impossible once the bit width becomes a
  * function of the corpus size (the production dial: bits ≈ log2(N/64)
  * keeps expected bucket occupancy constant, so candidate volume grows
  * LINEARLY in N instead of quadratically). This expression derives
  * every weight from pure integer arithmetic in (plane, dim) that
  * DuckDB can evaluate inside a lambda for ANY runtime bit count:
  *
  *   p = band·bitsPerBand + bit        (global plane index)
  *   a(p,i) = (p·31 + i·17 + 7) mod 8191
  *   w(p,i) = ((a² · (p+13)) mod 8191 mod 2001 − 1000) / 1000.0
  *
  * The quadratic a² term mixes plane and dim NON-linearly (a purely
  * affine family would make every plane a circular shift of the first —
  * the additive-mixing trap the bootstrap-CI and JL surfaces hit; see
  * the deterministic-hashing note in the verify skill). All integer
  * intermediates stay ≤ ~7.4e9 (exact in Long and DuckDB BIGINT), the
  * division by 1000.0 is exact-to-IEEE on both engines, and each plane
  * dot accumulates left-to-right in index order — matching DuckDB's
  * `list_reduce(list_transform(range(0, dim), ...), (x, y) -> x + y)`
  * fold exactly (the fold starts at element 0 instead of 0.0 + element
  * 0, which differs only on the sign of a zero sum — invisible to the
  * `s >= 0` sign test both sides use).
  *
  * Key format: `"<band>:"` + sign bits, same as [[LshBandKeys]].
  */
case class LshBandKeysLin(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "lsh_band_keys_lin"

  override protected def nullSafeEval(v: Any, bitsPerBand: Any, bands: Any): Any =
    LshBandKeysLin.compute(v.asInstanceOf[ArrayData],
      bitsPerBand.asInstanceOf[Int], bands.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, b, n) => s"graft.functions.LshBandKeysLin.compute($v, $b, $n)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LshBandKeysLin =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType, IntegerType)
        if second.foldable && third.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_band_keys_lin requires (array<double>, literal int, literal int), got " +
            s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
            s"${third.dataType.catalogString})")
    }
}

object LshBandKeysLin {

  /** The single weight-formula source — mirrored verbatim by the SQL
    * lambda in [[graft.operators.VectorOps.lshLinKeysSql]]. */
  def weight(p: Long, i: Long): Double = {
    val a = (p * 31 + i * 17 + 7) % 8191
    ((a * a * (p + 13)) % 8191 % 2001 - 1000).toDouble / 1000.0
  }

  // weights are deterministic in (dim, planeCount); cache primitive
  // arrays so the hot loop never recomputes the integer mixing
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def weights(dim: Int, planes: Int): Array[Array[Double]] =
    cache.computeIfAbsent((dim, planes),
      _ => Array.tabulate(planes, dim)((p, i) => weight(p.toLong, i.toLong)))

  /** All band keys for one vector (same null contract as
    * [[LshBandKeys.compute]]: dense non-null double arrays only). */
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
    classOf[LshBandKeysLin].getName, null, "lsh_band_keys_lin",
    "_FUNC_(v, bitsPerBand, bands) - banded LSH bucket keys ('<band>:' + sign " +
      "bits) from the oracle-expressible integer weight family.", "")
}
