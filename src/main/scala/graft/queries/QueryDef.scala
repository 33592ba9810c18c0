package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One coverage-checklist entry: the Spark query plus (when
  * SQL-expressible) the exactly-mirroring DuckDB oracle. Column names
  * and types are aligned on both sides; doubles only appear behind
  * ROUND() and money math goes through exact DECIMAL(12,2) inputs so
  * hashes can't drift on summation order. */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(fn: (SparkSession, String) => DataFrame, oracle: String): QueryDef =
    QueryDef(fn, Some(oracle))
  def rowsOnly(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, None)
}
