package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase distributed prefix sums (SURVEY.md §4): running
  * sum / row_number over a LOW-CARDINALITY partition key without
  * collapsing each key onto one task.
  *
  * `Window.partitionBy(lang).orderBy(...)` is correct but its
  * parallelism equals the number of distinct langs/services — at
  * 100 TB the whole biggest key sorts in ONE task. The classic fix is
  * the distributed scan (Blelloch two-phase prefix sum):
  *
  *   1. sub-shard each key with a caller-chosen chunk column that is
  *      monotone non-decreasing along the intended order (e.g.
  *      `doc_id div 64`, `start_us div 1h`, `-(tok_cnt div 32)` for a
  *      descending order) — parallelism becomes #(key, shard);
  *   2. run the window INSIDE each (key, shard) sub-shard;
  *   3. aggregate one total per sub-shard (tiny — partial map-side
  *      combine, rows = #sub-shards), prefix-sum those totals per key
  *      into EXCLUSIVE offsets, and broadcast them back;
  *   4. add offset + local running value — identical answers, because
  *      shard boundaries respect the total order.
  *
  * Cost: one extra scan of the input for the totals pass (itself a
  * partial agg) and a broadcast join, in exchange for parallelism
  * bounded by data size instead of key cardinality. Monotonicity of
  * the shard column along the order is the caller's contract — rows
  * that tie on the order columns must land in the same shard (true
  * whenever the shard is a pure function of a prefix of the order
  * key, as in all uses here).
  *
  * The shard expression must also be TOTAL on the caller's PRE-filter
  * rows: the offsets join keys on `_sw_shard`, so
  * InferFiltersFromConstraints derives `isnotnull(<shard expr>)` and
  * may push it below the caller's own filters or into a join
  * condition ahead of its non-equi legs — an ANSI-throwing
  * subexpression (a division whose guard lives in that join
  * condition, an overflowing cast) then fires on rows the caller
  * believed filtered. Guard such shards with `when(...)` (Spark 4.1
  * ANSI raises DIVIDE_BY_ZERO for double division too —
  * trace_theilsen_trend is the precedent).
  */
object ShardedWindow {

  private val Reserved = Seq("_sw_shard", "_sw_v", "_sw_local", "_sw_off")

  private def checkReserved(df: DataFrame): Unit =
    require(
      !df.columns.exists(Reserved.contains),
      s"input must not contain reserved columns ${Reserved.mkString(", ")}")

  /** ANSI-totality lint on the shard expression, enforced at plan-build
    * time on EVERY call site (the trace_theilsen_trend precedent was
    * caught by hand; this makes the class of bug impossible to ship).
    * Walks the ANALYZED `_sw_shard` tree: every division-family node
    * (Divide / IntegralDivide / Remainder / Pmod — all ANSI-throwing)
    * must either sit inside a `when()`/`if` VALUE branch (then the full
    * expression evaluates safely on any pre-filter row, which is what
    * InferFiltersFromConstraints' pushed `isnotnull(shard)` requires)
    * or divide by a foldable nonzero literal. For the INTEGRAL family
    * (div / % / pmod) a literal -1 is also rejected: `Long.MinValue
    * div -1` overflows under ANSI. Fractional division by -1.0 is
    * exact and safe, so it passes. A division in a when/if PREDICATE
    * is not guarded by that branch and stays linted.
    *
    * SCOPE OF THE GUARANTEE — this lint is SHAPE-level, not semantic:
    * it proves a division sits under a when()/if VALUE branch, but it
    * cannot prove the branch PREDICATE actually excludes zero
    * divisors. `when(col("flag") === 1, x / d)` passes the lint and
    * still throws DIVIDE_BY_ZERO on a pre-filter row with flag = 1,
    * d = 0. The caller's contract is that the when() predicate itself
    * rules out every zero-divisor row that can reach the expression
    * BEFORE the caller's own filters run (the whole point: inferred
    * isnotnull(shard) may be pushed ahead of them). Guard on the
    * divisor (`when(d =!= 0, x / d)`), not on a correlated flag. */
  private def checkShardTotal(tagged: DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, CaseWhen, Divide, Expression, If, IntegralDivide, Pmod, Remainder}
    val shardExpr = tagged.queryExecution.analyzed
      .collect { case p => p.expressions }.flatten
      .collectFirst { case a: Alias if a.name == "_sw_shard" => a.child }
    def safeDivisor(e: Expression, integral: Boolean): Boolean =
      e.foldable && (e.eval() match {
        case null => false
        case v =>
          val d = scala.util.Try(v.toString.toDouble).getOrElse(0.0)
          // -1 only overflows the integral family (MinValue div -1);
          // fractional x / -1.0 is exact negation and safe
          d != 0.0 && !(integral && d == -1.0)
      })
    def walk(e: Expression, guarded: Boolean): Unit = e match {
      case i: If =>
        walk(i.predicate, guarded); walk(i.trueValue, guarded = true); walk(i.falseValue, guarded = true)
      case c: CaseWhen =>
        c.branches.foreach { case (p, v) => walk(p, guarded); walk(v, guarded = true) }
        c.elseValue.foreach(walk(_, guarded = true))
      case d @ (_: Divide | _: IntegralDivide | _: Remainder | _: Pmod) =>
        val integral = d match {
          case _: IntegralDivide | _: Remainder | _: Pmod => true
          case _ => false
        }
        require(guarded || safeDivisor(d.children(1), integral),
          s"ShardedWindow shard expression contains an unguarded division `${d.sql}`: " +
            "the offsets join keys on the shard, so isnotnull(<shard>) can be inferred " +
            "and pushed ahead of the caller's own filters — wrap the division in a when() " +
            "whose predicate itself excludes zero divisors (the lint checks shape only, " +
            "not predicate semantics), or divide by a nonzero literal " +
            "(ANSI DIVIDE_BY_ZERO applies to doubles too)")
        d.children.foreach(walk(_, guarded))
      case other => other.children.foreach(walk(_, guarded))
    }
    shardExpr.foreach(walk(_, guarded = false))
  }

  /** Shared tag + lint + an EXPLICIT isnotnull(_sw_shard) filter.
    *
    * NON-NULL SHARD IS PART OF THE CALLER CONTRACT: the offsets
    * equi-join keys on `_sw_shard`, so null-shard rows never reach the
    * output of either phase — the explicit filter states that
    * constraint identically on both phases' subtrees. (A caller whose
    * shard expression CAN be null on its input rows must not rely on
    * any particular treatment of those rows; before r13 a null-shard
    * group's totals silently folded into every non-null shard's
    * offsets, after r13 the rows are dropped up front — both shapes
    * are out of contract.)
    *
    * The filter is also the key to executing the upstream lineage once
    * instead of once per phase: without it,
    * InferFiltersFromConstraints derives `isnotnull(<shard expr>)`
    * from the join and pushes it into the WINDOW branch's scan only,
    * so the two phases' subtrees stop canonicalizing equal and neither
    * static ReuseExchange nor AQE's wave replanning can deduplicate
    * them (measured on q_percentiles: the value-count aggregate ran
    * once per phase, three identical shuffles per call). With the
    * constraint stated identically on both branches the subtrees
    * match; the static planner then dedupes them outright (AQE off: 2
    * ReusedExchange), and under AQE the wave-replanning logical
    * substitution routes later waves through the already-materialized
    * stage (trace_queue_wait's spans-window exchange serves 16
    * references). Same-wave bottom-level duplicates still materialize
    * twice under AQE — its stage cache inserts the post-codegen-
    * optimized stage subtree as key but looks raw exchanges up (r14
    * measured; checkpointing the grid to force sharing measured WORSE,
    * see ExactQuantiles.percentiles). The totals phase stays a
    * pre-shuffle map-combined aggregate — its exchange carries
    * #(key, shard) rows, not data. */
  private def partitioned(
      df: DataFrame, keys: Seq[String], shard: Column, value: Column): DataFrame = {
    checkReserved(df)
    val tagged = df.withColumn("_sw_shard", shard).withColumn("_sw_v", value)
    checkShardTotal(tagged)
    tagged.filter(col("_sw_shard").isNotNull)
  }

  /** Running `sum(value)` over each `keys` partition in `order`
    * (inclusive ROWS UNBOUNDED PRECEDING..CURRENT ROW frame), equal to
    * `sum(value).over(Window.partitionBy(keys).orderBy(order))` but
    * with per-(key, shard) parallelism. `shard` must be monotone
    * non-decreasing along `order` within every key, total (ANSI-safe)
    * and NON-NULL on every pre-filter row (see [[partitioned]]).
    *
    * `keyTotalOut`: optionally ALSO emit each key's grand total of
    * `value` as an extra column, computed on the (tiny) per-shard
    * totals relation and carried back on the same broadcast join —
    * a caller needing "running sum + the key's n" (ExactQuantiles'
    * rank thresholds) otherwise pays a THIRD full derivation of the
    * input for a one-number-per-key aggregate. Long addition over the
    * shard totals is exact and order-free, so the value is identical
    * to a direct groupBy(keys).sum. */
  def runningSum(
      df: DataFrame,
      keys: Seq[String],
      shard: Column,
      order: Seq[Column],
      value: Column,
      out: String,
      keyTotalOut: Option[String] = None): DataFrame = {
    val parted = partitioned(df, keys, shard, value)
    val localW = Window
      .partitionBy((keys.map(col) :+ col("_sw_shard")): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("_sw_local", sum(col("_sw_v")).over(localW))
    // One row per (key, shard): driver-scale however big the data is.
    val totals = parted
      .groupBy((keys.map(col) :+ col("_sw_shard")): _*)
      .agg(sum(col("_sw_v")).as("_sw_total"))
    val offW = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_sw_shard"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = totals
      .withColumn("_sw_off", sum(col("_sw_total")).over(offW) - col("_sw_total"))
    val offsets = keyTotalOut match {
      case None =>
        withCum.select((keys.map(col) :+ col("_sw_shard") :+ col("_sw_off")): _*)
      case Some(tn) =>
        withCum
          .withColumn(tn, sum(col("_sw_total"))
            .over(Window.partitionBy(keys.map(col): _*)))
          .select((keys.map(col) :+ col("_sw_shard") :+ col("_sw_off") :+ col(tn)): _*)
    }
    local
      .join(broadcast(offsets), keys :+ "_sw_shard")
      .withColumn(out, col("_sw_local") + col("_sw_off"))
      .drop("_sw_shard", "_sw_v", "_sw_local", "_sw_off")
  }

  /** Running `min(value)` over each `keys` partition in `order` —
    * prefix minimum is associative, so the same two-phase scan applies:
    * local running min inside each (key, shard), one min per sub-shard,
    * EXCLUSIVE prefix-min of those totals as the carried-in offset
    * (null for the first shard — `least` skips nulls), then
    * least(local, offset). Same monotone-shard contract as
    * [[runningSum]]. */
  def runningMin(
      df: DataFrame,
      keys: Seq[String],
      shard: Column,
      order: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    val parted = partitioned(df, keys, shard, value)
    val localW = Window
      .partitionBy((keys.map(col) :+ col("_sw_shard")): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("_sw_local", min(col("_sw_v")).over(localW))
    val totals = parted
      .groupBy((keys.map(col) :+ col("_sw_shard")): _*)
      .agg(min(col("_sw_v")).as("_sw_total"))
    val offW = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_sw_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("_sw_off", min(col("_sw_total")).over(offW))
      .select((keys.map(col) :+ col("_sw_shard") :+ col("_sw_off")): _*)
    local
      .join(broadcast(offsets), keys :+ "_sw_shard")
      .withColumn(out, least(col("_sw_local"), col("_sw_off")))
      .drop("_sw_shard", "_sw_v", "_sw_local", "_sw_off")
  }

  /** EXCLUSIVE running `max(value)` — the max over all STRICTLY
    * PRECEDING rows (null on each key's first row), the scan interval
    * merging needs ("does this interval start after every previous one
    * ended?"). Sharded identically: the local window takes the
    * (unboundedPreceding, -1) frame, and the carried-in offset is the
    * max over WHOLE previous sub-shards (which are entirely preceding,
    * so inclusive shard totals are correct); greatest() skips the
    * nulls at shard starts. */
  def runningMaxExclusive(
      df: DataFrame,
      keys: Seq[String],
      shard: Column,
      order: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    val parted = partitioned(df, keys, shard, value)
    val localW = Window
      .partitionBy((keys.map(col) :+ col("_sw_shard")): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("_sw_local", max(col("_sw_v")).over(localW))
    val totals = parted
      .groupBy((keys.map(col) :+ col("_sw_shard")): _*)
      .agg(max(col("_sw_v")).as("_sw_total"))
    val offW = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_sw_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("_sw_off", max(col("_sw_total")).over(offW))
      .select((keys.map(col) :+ col("_sw_shard") :+ col("_sw_off")): _*)
    local
      .join(broadcast(offsets), keys :+ "_sw_shard")
      .withColumn(out, greatest(col("_sw_local"), col("_sw_off")))
      .drop("_sw_shard", "_sw_v", "_sw_local", "_sw_off")
  }

  /** `row_number()` over each `keys` partition in `order` (a running
    * COUNT(1)), sharded the same way; `order` must totally order rows
    * within each key for the numbering to be deterministic. Returns
    * LongType (a running sum), where `row_number()` returns int.
    * `keyTotalOut` optionally emits each key's row count alongside
    * (= COUNT(*) OVER (PARTITION BY keys)) on the same broadcast —
    * see [[runningSum]]. */
  def rowNumber(
      df: DataFrame,
      keys: Seq[String],
      shard: Column,
      order: Seq[Column],
      out: String,
      keyTotalOut: Option[String] = None): DataFrame =
    runningSum(df, keys, shard, order, lit(1L), out, keyTotalOut)
}
