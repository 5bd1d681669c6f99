package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query from SURVEY.md §2.11: a Spark builder plus the
  * DuckDB oracle SQL the driver hash-compares against (None = rows-only
  * smoke check for non-SQL-expressible ops).
  *
  * Determinism contract (SURVEY.md §7.4): every query emits a total
  * ORDER BY over a unique key, rounds aggregated doubles to 4 decimals
  * on BOTH sides, never emits raw nanosecond `events.ts`, and casts
  * derived integers to BIGINT on both sides so schemas line up.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    note: String = "")

object QueryDef {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): QueryDef =
    QueryDef(fn, Some(sql))
}
