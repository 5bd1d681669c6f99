package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query from SURVEY.md §2.11 is one `(spark, sfDir) =>
  * DataFrame` builder registered here with its DuckDB oracle SQL.
  * Builders live in graft.ops.* grouped by operator family.
  */
object SparkEntry {

  /** All operator modules, in SURVEY.md §7.2 build order. */
  private val modules: Seq[Seq[(String, QueryDef)]] = Seq(
    Relational.defs,
    Incremental.defs,
    Joins.defs,
    Windows.defs,
    TextOps.defs,
    VectorOps.defs,
    TextDedup.defs,
    Media.defs)

  val all: Map[String, QueryDef] = modules.flatten.toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q_daily_avg — the reference's core computation (energy_etl.py:69-70). */
  def entry(spark: SparkSession): DataFrame =
    all("q_daily_avg").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, d) => name -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (name, QueryDef(_, Some(sql), _)) => name -> sql }
}
