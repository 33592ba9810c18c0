package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]] — the executor
  * side of [[graft.operators.BloomJoin]]. The filter is a plan-time
  * object (built once from the small side, a few MB at production fpp),
  * shipped to executors with the serialized plan exactly like Spark's
  * own runtime-filter `BloomFilterMightContain` (which is internal
  * API — this is the same pattern on the public sketch class, a
  * codegen'd static call with no boxing, so the probe rides inside
  * whole-stage codegen in the scan stage).
  *
  * False positives pass (by bloom contract) and are eliminated by the
  * exact join that follows; false negatives are impossible, which is
  * what makes the prefilter semantics-free.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain supports bigint/string keys, got ${other.catalogString}")
  }

  // String keys probe via mightContainBinary on the UTF8String's bytes:
  // the builder (stat.bloomFilter → BinaryUpdater) put the UTF-8 bytes,
  // and mightContainString would re-decode to java.lang.String and
  // re-encode per row — two allocations in the scan's hot loop for the
  // same hash input.
  override protected def nullSafeEval(key: Any): Any = child.dataType match {
    case LongType => bloom.mightContainLong(key.asInstanceOf[Long])
    case StringType =>
      bloom.mightContainBinary(key.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    child.dataType match {
      case LongType => defineCodeGen(ctx, ev, k => s"$ref.mightContainLong($k)")
      case StringType => defineCodeGen(ctx, ev, k => s"$ref.mightContainBinary($k.getBytes())")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
