package graft

import graft.util.Tables

/** The SQL entry surface (SURVEY.md §3.4): the same queries run as SQL
  * text through spark.sql over registered temp views. For every declared
  * query whose oracle SQL is ANSI-portable (no DuckDB-specific
  * functions), executing that exact SQL in Spark must return the same
  * rows as the DataFrame builder — one query, three agreeing engines
  * (Spark DataFrame, Spark SQL, DuckDB). */
class SqlSurfaceSpec extends SparkSpec {

  /** Oracle SQL that parses and evaluates identically on Spark SQL. */
  private val portable = Seq(
    "q_agg_basic", "q_agg_distinct", "q_daily_avg", "q_filter_pred",
    "q_join_inner", "q_join_outer", "q_join_semi", "q_join_anti",
    "q_join_multiway", "q_sort_multi", "q_topk", "q_union_all",
    "q_union_distinct", "q_intersect_except", "q_window_rank",
    "q_window_analytic", "q_window_frame", "q_topk_per_group",
    "q_dedup_exact", "q_null_funcs", "q_stream_tumbling")

  private def registerViews(): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.load(spark, sf, t).createOrReplaceTempView(t)
    }
    Tables.events(spark, sf).createOrReplaceTempView("events")
  }

  portable.foreach { name =>
    test(s"$name: spark.sql(oracle text) == DataFrame builder") {
      registerViews()
      val d = SparkEntry.all(name)
      // SQL literals like 10000.0 parse as DECIMAL in Spark SQL while the
      // builder uses double lits — numerically identical, typed apart.
      // Normalize numerics to double before comparing.
      def norm(r: org.apache.spark.sql.Row): Seq[Any] = r.toSeq.map {
        case d: java.math.BigDecimal => d.doubleValue()
        case x => x
      }
      val viaSql = spark.sql(d.oracle.get).collect().map(norm)
      val viaDf = d.fn(spark, sf).collect().map(norm)
      assert(viaSql.length === viaDf.length, s"row counts differ")
      viaSql.zip(viaDf).zipWithIndex.foreach { case ((s, df), i) =>
        assert(s === df, s"row $i differs")
      }
    }
  }
}
