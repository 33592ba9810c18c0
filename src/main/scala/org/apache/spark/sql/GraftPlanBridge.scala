package org.apache.spark.sql

import graft.plans.{AsOfJoin, AsOfJoinPlan}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.classic.{Dataset => CDataset}
import org.apache.spark.sql.functions.col

/** Bridge into package-private Spark internals, the same public pattern
  * open-source Spark extensions use to construct Datasets from custom
  * logical plans (Dataset.ofRows is private[sql]). All graft code calls
  * in through here; nothing else lives in the Spark namespace.
  */
object GraftPlanBridge {

  /** Wrap a Catalyst expression as a user-facing Column (Column(expr)
    * went private behind the Spark 4 ColumnNode refactor). */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** The Catalyst expression behind a Column. */
  def expressionOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Inner AS-OF join: for each left row, the right row with equal keys
    * and the largest `rightTime` ≤ `leftTime`. Right columns are
    * suffixed to keep self-joins unambiguous (fresh exprIds). Key and
    * time columns are resolved here by name, so the custom plan enters
    * the analyzer fully resolved. */
  def asofJoin(
      left: Dataset[Row],
      right: Dataset[Row],
      keys: Seq[String],
      timeCol: String,
      rightSuffix: String = "_r",
      nearest: Boolean = false): DataFrame = {
    val l = left.asInstanceOf[CDataset[Row]]
    val spark = l.sparkSession
    AsOfJoin.register(spark)

    val r2 = right.select(right.columns.map(c => col(c).as(c + rightSuffix)).toIndexedSeq: _*)
      .asInstanceOf[CDataset[Row]]

    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${out.map(_.name)}"))

    val lOut = l.queryExecution.analyzed.output
    val rOut = r2.queryExecution.analyzed.output
    // the merge scan evaluates time as a raw Long — fail analysis-time
    // with a clear message rather than ClassCastException mid-stage
    Seq(attr(lOut, timeCol), attr(rOut, timeCol + rightSuffix)).foreach { t =>
      if (t.dataType != org.apache.spark.sql.types.LongType)
        throw new IllegalArgumentException(
          s"asofJoin time column '${t.name}' must be LongType (epoch micros), " +
            s"got ${t.dataType.simpleString}; cast it before joining")
    }
    CDataset.ofRows(spark, AsOfJoinPlan(
      l.queryExecution.analyzed,
      r2.queryExecution.analyzed,
      keys.map(attr(lOut, _)),
      keys.map(k => attr(rOut, k + rightSuffix)),
      attr(lOut, timeCol),
      attr(rOut, timeCol + rightSuffix),
      nearest))
  }
}
