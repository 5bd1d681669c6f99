package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted table statistics feeding Spark's cost-based optimizer.
  *
  * q_profile (Relational.profile) computes per-column row counts, null
  * counts, NDV and min/max as a QUERY RESULT — useful to a human, but
  * invisible to the planner. At 100 TB the planner needs the same
  * numbers to reorder joins (a mis-ordered fact-fact-dim join is the
  * difference between shuffling 100 TB twice and once): Spark's
  * `CostBasedJoinReorder` only fires when every join input has catalog
  * row-count + column statistics and `spark.sql.cbo.enabled` /
  * `spark.sql.cbo.joinReorder.enabled` are set.
  *
  * The public, engine-native path for persisting stats is the catalog:
  * register the parquet directory as an EXTERNAL table (no data copy —
  * `CREATE TABLE ... USING parquet OPTIONS (path ...)`) and run
  * `ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...]`. ANALYZE is
  * itself a distributed aggregate — the planner-facing twin of
  * q_profile. Stats land in the session catalog (a Hive metastore in a
  * production deployment, where they persist across applications; the
  * in-memory catalog scopes them to the session here — same API either
  * way).
  *
  * The reference has no optimizer at all (115-line pandas script); this
  * is part of the 100 TB extension surface (SURVEY.md §2.9, VERDICT r4
  * "What's missing" item 3).
  */
object Stats {

  /** Register `path` as external parquet table `name` and compute
    * row-count + per-column CBO statistics. Idempotent (re-running
    * refreshes the stats). Column list defaults to every top-level
    * atomic column — ANALYZE rejects nested/array columns. */
  def analyzeExternal(
      spark: SparkSession,
      name: String,
      path: String,
      cols: Seq[String] = Nil): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.sql(s"CREATE TABLE `$name` USING parquet OPTIONS (path '$path')")
    val statCols =
      if (cols.nonEmpty) cols
      else spark.table(name).schema.fields.collect {
        case f if isAnalyzable(f.dataType) => f.name
      }.toSeq
    spark.sql(s"ANALYZE TABLE `$name` COMPUTE STATISTICS")
    if (statCols.nonEmpty)
      spark.sql(s"ANALYZE TABLE `$name` COMPUTE STATISTICS FOR COLUMNS " +
        statCols.map(c => s"`$c`").mkString(", "))
  }

  private def isAnalyzable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: NumericType | StringType | BinaryType | BooleanType |
           DateType | TimestampType => true
      case _ => false
    }
  }

  /** The stats the catalog now holds for `name`, one row per column
    * (plus a `__table__` row carrying rowCount/sizeInBytes) — the
    * persisted counterpart of q_profile's result, read back from the
    * same store the optimizer reads. */
  def describeStats(spark: SparkSession, name: String): DataFrame = {
    import spark.implicits._
    val rel = spark.table(name).queryExecution.optimizedPlan
    val st = rel.stats
    val tableRow = ("__table__",
      st.rowCount.map(_.toString).getOrElse(null: String),
      st.sizeInBytes.toString, null: String, null: String)
    val colRows = st.attributeStats.map { case (attr, s) =>
      (attr.name,
        s.distinctCount.map(_.toString).getOrElse(null: String),
        s.nullCount.map(_.toString).getOrElse(null: String),
        s.min.map(_.toString).getOrElse(null: String),
        s.max.map(_.toString).getOrElse(null: String))
    }.toSeq
    (tableRow +: colRows)
      .toDF("col_name", "distinct_or_rowcount", "nulls_or_size", "min_v", "max_v")
  }

  /** Run `body` with the cost-based optimizer (and its join-reorder
    * rule) enabled, restoring the previous session config after. */
  def withCbo[A](spark: SparkSession)(body: => A): A = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "true"))
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
