package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.SparkStrategy

/** AS-OF join — a whole-operator Spark lacks, implemented at the
  * preference-ladder's (c) tier (SURVEY.md §2): custom LogicalPlan +
  * SparkStrategy + physical SparkPlan, injected through
  * SparkSessionExtensions.
  *
  * Semantics (inner as-of): for each left row, the single right row
  * with matching keys and the LARGEST right time ≤ the left time.
  * The declarative workaround (join on key + time range, then
  * row_number to keep the latest) shuffles and ranks EVERY candidate
  * pair; this operator asks Catalyst for co-partitioned,
  * (key, time)-sorted children and then streams both sides once per
  * partition — O(n+m) after the sort, no candidate blow-up. That's the
  * shape that survives 100 TB: one co-partitioned shuffle per side,
  * merge scan, nothing materialized.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    nearest: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, near) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, near) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    nearest: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // Catalyst inserts the hash exchanges (co-partitioned on the keys) and
  // the per-partition (key, time) sorts for us — the operator only ever
  // sees sorted runs.
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  // Right ordering appends the remaining CHEAP right columns after
  // (keys, time): when several right rows tie on the max time ≤ left
  // time, the one the scan keeps (last in sort order) is then a total-
  // order maximum over those columns — deterministic across runs and
  // partitionings instead of whatever the sort happened to place last.
  // Wide payload columns (binary, arrays, maps, structs) are excluded
  // from the sort key: comparing full payloads per row would tax every
  // join to guard a rare tie, so rows identical in all scalar columns
  // but differing inside a payload may still resolve either way.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    val rKeyTime = rightKeys :+ rightTime
    val rTieBreak = right.output
      .filterNot(a => rKeyTime.exists(_.semanticEquals(a)))
      .filter(a => a.dataType match {
        case _: org.apache.spark.sql.types.NumericType => true
        case org.apache.spark.sql.types.StringType |
             org.apache.spark.sql.types.BooleanType |
             org.apache.spark.sql.types.DateType |
             org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => true
        case _ => false
      })
    Seq(
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
      (rKeyTime ++ rTieBreak).map(SortOrder(_, Ascending)))
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val lOutput = left.output
    val rOutput = right.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (lIter.isEmpty || rIter.isEmpty) Iterator.empty
      else {
        val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
        val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
        val keySchema = lKeys.map(k => SortOrder(org.apache.spark.sql.catalyst.expressions
          .BoundReference(lKeys.indexOf(k), k.dataType, k.nullable), Ascending))
        val keyOrd = GenerateOrdering.generate(keySchema, Nil)
        val lTimeBound = org.apache.spark.sql.catalyst.expressions.BindReferences
          .bindReference(lTime, lOutput)
        val rTimeBound = org.apache.spark.sql.catalyst.expressions.BindReferences
          .bindReference(rTime, rOutput)
        val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow

        // right side cursor state: current candidate (latest right row
        // whose time <= current left time, same key)
        var rRow: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
        var candidate: InternalRow = null
        var candidateKey: InternalRow = null

        lIter.flatMap { lRow =>
          val lKey = lKeyProj(lRow)
          val lTimeVal = lTimeBound.eval(lRow)
          if (lTimeVal == null) Iterator.empty // NULL left time matches nothing
          else {
          val lT = lTimeVal.asInstanceOf[Long]
          // drop candidate from a previous key group
          if (candidate != null && keyOrd.compare(candidateKey, lKey) != 0) {
            candidate = null; candidateKey = null
          }
          // advance right while it is behind (smaller key, or same key
          // with time <= left time — each such row becomes the candidate)
          var advancing = true
          while (advancing && rRow != null) {
            val rKey = rKeyProj(rRow)
            val c = keyOrd.compare(rKey, lKey)
            lazy val rTimeVal = rTimeBound.eval(rRow)
            if (c < 0) {
              rRow = if (rIter.hasNext) rIter.next().copy() else null
            } else if (c == 0 && rTimeVal == null) {
              // NULL right time never matches (sorts first; skip it)
              rRow = if (rIter.hasNext) rIter.next().copy() else null
            } else if (c == 0 && rTimeVal.asInstanceOf[Long] <= lT) {
              candidate = rRow
              candidateKey = rKey.copy()
              rRow = if (rIter.hasNext) rIter.next().copy() else null
            } else {
              advancing = false
            }
          }
          // Backward candidate: latest right time <= left time (ties
          // resolved to the sort-order maximum by the scan). NEAREST
          // adds the PEEKED forward row — rRow at the stop point is
          // the first same-key right row with time > left time (ties
          // there resolve to the sort-order minimum); closer absolute
          // distance wins, exact tie prefers backward. rRow is only
          // peeked, never consumed — it may still become a later left
          // row's backward candidate.
          val back =
            if (candidate != null && keyOrd.compare(candidateKey, lKey) == 0)
              candidate else null
          val fwd =
            if (nearest && rRow != null && keyOrd.compare(rKeyProj(rRow), lKey) == 0)
              rRow else null
          val chosen =
            if (back == null) fwd
            else if (fwd == null) back
            else {
              val backDiff = lT - rTimeBound.eval(back).asInstanceOf[Long]
              val fwdDiff = rTimeBound.eval(fwd).asInstanceOf[Long] - lT
              if (fwdDiff < backDiff) fwd else back
            }
          if (chosen != null)
            Iterator.single(resultProj(joined(lRow, chosen)))
          else Iterator.empty
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Make the strategy available on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[AsOfJoinStrategy])) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new AsOfJoinStrategy
    }
  }
}
