package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the load-time validation surface
  * the reference delegates to BigQuery's schema (energy_etl.py:92-97),
  * generalized: each check is one aggregate expression, ALL checks run
  * in a single pass over the data (one job, map-side combined), and the
  * result is a small report DataFrame a pipeline can act on.
  *
  * Scale: N checks = N aggregate expressions in ONE aggregation — never
  * one job per check over 100 TB.
  */
object Checks {

  final case class Check(name: String, agg: Column, expectTrue: Column)

  /** count(*) within [lo, hi]. */
  def rowCount(lo: Long, hi: Long): Check = {
    val c = count(lit(1))
    Check(s"row_count_in_[$lo,$hi]", c, c.between(lo, hi))
  }

  /** No nulls in the column. */
  def notNull(colName: String): Check = {
    val nulls = count(lit(1)) - count(col(colName))
    Check(s"not_null_$colName", nulls, nulls === 0L)
  }

  /** Null ratio at most r. */
  def nullRatioAtMost(colName: String, r: Double): Check = {
    val ratio = (count(lit(1)) - count(col(colName))).cast("double") /
      count(lit(1))
    Check(s"null_ratio_${colName}_le_$r", round(ratio, 6), ratio <= r)
  }

  /** Column values all within the closed range. */
  def inRange(colName: String, lo: Double, hi: Double): Check = {
    val bad = sum(when(col(colName) < lo || col(colName) > hi, 1L).otherwise(0L))
    Check(s"in_range_${colName}_[$lo,$hi]", coalesce(bad, lit(0L)),
      coalesce(bad, lit(0L)) === 0L)
  }

  /** Column values restricted to the allowed set. */
  def inSet(colName: String, allowed: Seq[String]): Check = {
    val bad = sum(when(!col(colName).isin(allowed: _*), 1L).otherwise(0L))
    Check(s"in_set_$colName", coalesce(bad, lit(0L)),
      coalesce(bad, lit(0L)) === 0L)
  }

  /** Key is unique (no duplicate values). */
  def unique(colName: String): Check = {
    val dups = count(col(colName)) - countDistinct(col(colName))
    Check(s"unique_$colName", dups, dups === 0L)
  }

  /** Run all checks in one aggregation pass; returns
    * (check, observed, passed) rows. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    // positional aliases — check names may contain chars col() can't parse
    val aggs = checks.zipWithIndex.flatMap { case (c, i) =>
      Seq(c.agg.cast("string").as(s"v_$i"), c.expectTrue.as(s"p_$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val cols = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), col(s"v_$i").as("observed"),
        col(s"p_$i").as("passed"))
    }
    row.select(explode(array(cols: _*)).as("r")).select(col("r.*"))
  }

  /** True iff every check passed. */
  def allPassed(report: DataFrame): Boolean =
    report.filter(!col("passed")).isEmpty
}
