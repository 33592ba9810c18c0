package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native array math for the vector tier — the hot per-pair kernels of
  * every cosine verify / integer k-NN surface.
  *
  * WHY expressions and not the higher-order Column forms: Spark's
  * `aggregate(zip_with(...))` lambdas evaluate INTERPRETED (higher-order
  * functions have no codegen), and they sit on candidate-PAIR relations
  * — at sf10 the cell-candidate surfaces evaluate them ~180 M times
  * (embed_lof measured 423 s; the kernel dominated). These expressions
  * are one static call inside whole-stage codegen.
  *
  * Bit-exactness contract (the oracle depends on it):
  *  - [[ArrDot]] accumulates s = 0.0; s += a(i)·b(i) left-to-right —
  *    the IDENTICAL IEEE sequence as
  *    `aggregate(zip_with(a, b, _*_), 0.0, _+_)` and DuckDB's
  *    list_dot_product, so scores (and the hashes built on them)
  *    cannot move.
  *  - [[ArrL2Sq]] sums (a(i)−b(i))² in EXACT long arithmetic with
  *    Math.{subtract,multiply,add}Exact, so overflow throws loudly
  *    exactly like the ANSI-mode Column form it replaces.
  *  - Null semantics mirror the higher-order forms: mismatched lengths
  *    (zip_with pads with null) or any null element make the result
  *    null.
  */
case class ArrDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "arr_dot"
  // compute() yields null on mismatched lengths / null elements even
  // when children are non-nullable — declare it (the MinHashSig lesson)
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh name: the same expression can appear twice in one
      // generated method (e.g. a score in both filter and project)
      val r = ctx.freshName("arrDotRes")
      s"""
      |java.lang.Double $r = graft.functions.ArrDot.compute($a, $b);
      |if ($r == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = $r.doubleValue();
      |}""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrDot =
    copy(left = newLeft, right = newRight)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"arr_dot requires (array<double>, array<double>), got " +
            s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
}

object ArrDot {
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ArrDot].getName, null, "arr_dot",
    "_FUNC_(a, b) - exact left-fold dot product of two double arrays.", "")
}

case class ArrL2Sq(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "arr_l2sq"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrL2Sq.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("arrL2Res")
      s"""
      |java.lang.Long $r = graft.functions.ArrL2Sq.compute($a, $b);
      |if ($r == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = $r.longValue();
      |}""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrL2Sq =
    copy(left = newLeft, right = newRight)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"arr_l2sq requires (array<bigint>, array<bigint>), got " +
            s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
}

/** Exact integer dot product — the long sibling of [[ArrDot]], for the
  * milli-quantized vector surfaces whose scores are BIGINT end to end.
  * Replaces `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, +)`, which
  * evaluates interpreted (higher-order functions have no codegen);
  * products and the running sum use Math.*Exact so overflow throws
  * loudly exactly like the ANSI-mode Column form it replaces. */
case class ArrDotL(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "arr_dotl"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrDotL.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("arrDotLRes")
      s"""
      |java.lang.Long $r = graft.functions.ArrDotL.compute($a, $b);
      |if ($r == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = $r.longValue();
      |}""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrDotL =
    copy(left = newLeft, right = newRight)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"arr_dotl requires (array<bigint>, array<bigint>), got " +
            s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
}

object ArrDotL {
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s = Math.addExact(s, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ArrDotL].getName, null, "arr_dotl",
    "_FUNC_(a, b) - exact integer dot product of two bigint arrays " +
      "(overflow throws, matching ANSI).", "")
}

object ArrL2Sq {
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = Math.subtractExact(a.getLong(i), b.getLong(i))
      s = Math.addExact(s, Math.multiplyExact(d, d))
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ArrL2Sq].getName, null, "arr_l2sq",
    "_FUNC_(a, b) - exact squared L2 distance of two bigint arrays " +
      "(overflow throws, matching ANSI).", "")
}
