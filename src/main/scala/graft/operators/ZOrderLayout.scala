package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional data
  * skipping for the at-rest store. A single-column sort clusters one
  * dimension perfectly and scatters every other; interleaving the bits
  * of two dimensions clusters BOTH approximately, so parquet min/max
  * stats (file- and row-group-level) prune 2-D box queries — the
  * "spans by (traceKey, time)" / "docs by (lang, quality)" access
  * pattern where neither dimension alone is the primary filter.
  * This is the same layout idea Delta's OPTIMIZE ZORDER BY and
  * Iceberg's sort-order z-curves apply; here it is a plain
  * repartitionByRange + local sort on the computed z-value, so it
  * runs anywhere Spark writes parquet.
  *
  * Scale shape: computing z is row-local (codegen'd shift/mask
  * arithmetic, no shuffle); the one exchange is the range partition by
  * z — exactly the shuffle any CLUSTER BY pays — and pruning gains
  * compound at 100 TB where a full scan is hours. The min/max
  * normalization bounds come from a one-pass stats job (or table
  * metadata in a real deployment).
  */
object ZOrderLayout {

  /** Bit-spread a 16-bit value so its bits occupy even positions of a
    * 32-bit lane (classic Morton magic numbers), expressed as Column
    * shift/mask arithmetic — codegen-friendly, no UDF. */
  private def spread16(c: Column): Column = {
    val a = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Normalize a numeric column to [0, 65535] given its min/max. */
  private def norm16(c: Column, lo: Double, hi: Double): Column = {
    val span = if (hi > lo) hi - lo else 1.0
    least(lit(65535L), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(span) * 65535.0).cast("long")))
  }

  /** The interleaved z-value of two normalized 16-bit lanes. */
  def zValue(x: Column, y: Column, xLo: Double, xHi: Double, yLo: Double, yHi: Double): Column =
    spread16(norm16(x, xLo, xHi)).bitwiseOR(shiftleft(spread16(norm16(y, yLo, yHi)), 1))

  /** Write `df` z-ordered by (xCol, yCol) into `outPath` as parquet:
    * one stats pass for the normalization bounds, one range shuffle on
    * z, a local sort, and a parquet write whose files carry tight
    * min/max envelopes on BOTH columns. `nFiles` controls the output
    * granularity (more files = finer pruning, more metadata). */
  def writeZOrdered(
      df: DataFrame, outPath: String, xCol: String, yCol: String, nFiles: Int): Unit = {
    val b = df.agg(
      min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).head()
    if (b.isNullAt(0) || b.isNullAt(2)) {
      // empty input (or all-null layout columns): no bounds to normalize
      // against — write the empty/degenerate dataset as-is rather than
      // NPE on the null stats row
      df.write.mode("overwrite").parquet(outPath)
      return
    }
    val z = zValue(col(xCol), col(yCol), b.getDouble(0), b.getDouble(1),
      b.getDouble(2), b.getDouble(3))
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(outPath)
  }

  /** Per-file (min, max) envelope of `colName` across the parquet files
    * under `path` — the same statistic the reader's file/row-group
    * pruning consults, materialized for specs and capacity planning.
    * One distributed pass grouped by `input_file_name` (not a Spark job
    * per file); rows with a null column are ignored like parquet stats
    * ignore them, and an all-null file reports no envelope. */
  def fileEnvelopes(
      s: SparkSession, path: String, colName: String): Seq[(String, Double, Double)] = {
    s.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(colName)).cast("double").as("lo"), max(col(colName)).cast("double").as("hi"))
      .collect().toSeq
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
  }
}
