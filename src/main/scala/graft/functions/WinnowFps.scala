package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
  * SIGMOD 2003) as one codegen'd Catalyst expression:
  * `winnow_fps(text, k, w)` → `array<long>` of packed
  * `(pos << 20) | hash` fingerprints, pos 1-based gram position,
  * hash the polynomial base-31 mod-1000003 char k-gram hash
  * (20 bits suffice: 1000003 < 2^20).
  *
  * Row-identical to the declarative build in
  * [[graft.operators.TextOps.winnow]] (WinnowNativeSpec pins equality
  * on the real corpus and adversarial tie cases): same codepoint
  * stream as Spark's `split(text, '')`+`ascii`, same exact-long hash,
  * same rightmost-on-ties window minimum, same distinct (pos, hash)
  * set. Returns null when the text is shorter than k+w-1 codepoints —
  * the declarative path filters those docs out, and `explode` drops
  * the null, so the two paths stay row-identical.
  *
  * WHY an expression: the declarative selection shuffles a w×-exploded
  * (doc, window-start, pos, hash) stream through a groupBy and a join
  * back — measured 17.7 s at sf0.1 where this one-pass form runs in
  * the scan stage, selection via a single O(L·w) local sweep (w is a
  * small constant; selections are non-decreasing in position, so the
  * distinct set falls out of a last-emitted check, no set allocation).
  * This is the SimHash48/LshBandKeys pattern: fingerprinting belongs
  * in the map stage; only selected fingerprints (~2/(w+1) of grams)
  * ever reach an exchange.
  */
case class WinnowFps(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  // short texts yield null (see class doc) even under non-null input
  override def nullable: Boolean = true

  override protected def nullSafeEval(text: Any, k: Any, w: Any): Any =
    WinnowFps.compute(text.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k, w) => s"""
      |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
      |  graft.functions.WinnowFps.compute($t, $k, $w);
      |if (${ev.value}_r == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}_r;
      |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WinnowFps =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType)
        if second.foldable && third.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fps requires (string, literal int, literal int), got " +
            s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
            s"${third.dataType.catalogString})")
    }
}

object WinnowFps {

  final val Mod = 1000003L
  final val Base = 31L

  val info = new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps")

  /** One document's fingerprint set; see class doc for the contract.
    * k ∈ [2,9] keeps codepoint·31^(k-1)·k inside exact long range
    * (max ~9.7e17 < 2^63) — the same bound TextOps.winnow requires. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    require(k >= 2 && k <= 9, s"k=$k outside exact-long-hash range [2,9]")
    require(w >= 2, s"w=$w: winnowing needs a window of at least 2")
    val s = text.toString
    // codepoints, matching split(text,'') + ascii(): one entry per
    // codepoint (surrogate pairs are one gram char, not two)
    val n = s.codePointCount(0, s.length)
    if (n < k + w - 1) return null
    val cp = new Array[Long](n)
    var ci = 0
    var off = 0
    while (off < s.length) {
      val c = s.codePointAt(off)
      cp(ci) = c.toLong
      ci += 1
      off += Character.charCount(c)
    }
    // gram hashes: h[i] = (Σ_j cp[i+j]·31^(k-1-j)) mod M, exact longs
    val L = n - k + 1
    val pow = new Array[Long](k)
    pow(k - 1) = 1L
    var j = k - 2
    while (j >= 0) { pow(j) = pow(j + 1) * Base; j -= 1 }
    val h = new Array[Long](L)
    var i = 0
    while (i < L) {
      var acc = 0L
      var jj = 0
      while (jj < k) { acc += cp(i + jj) * pow(jj); jj += 1 }
      h(i) = acc % Mod
      i += 1
    }
    // window minimum, rightmost on ties; selections are non-decreasing
    // in position as the window slides, so consecutive-dedup yields the
    // distinct (pos, hash) set in position order
    val out = new scala.collection.mutable.ArrayBuffer[Long](L / w * 2 + 4)
    var lastIdx = -1
    var st = 0
    val nWin = L - w + 1
    while (st < nWin) {
      var idx = st + w - 1
      var jw = st + w - 2
      while (jw >= st) {
        if (h(jw) < h(idx)) idx = jw
        jw -= 1
      }
      if (idx != lastIdx) {
        // pos is 1-based to match the declarative path
        out += ((idx + 1).toLong << 20) | h(idx)
        lastIdx = idx
      }
      st += 1
    }
    new GenericArrayData(out.toArray)
  }
}
