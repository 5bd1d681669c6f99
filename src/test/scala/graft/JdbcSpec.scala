package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import graft.sources.Jdbc

/** Loopback e2e for the generic JDBC source/sink (VERDICT r8 item 8) —
  * the HttpSourceSpec precedent: an EMBEDDED Derby database
  * (jdbc:derby:memory:, in-JVM, no network) plays the warehouse, so
  * round-trip, pushdown, partitioned parallel read, and the batched
  * upsert are all exercised against a real JDBC engine. local[n]
  * executors are threads of this JVM, so every "executor" connection
  * resolves the same in-memory database — on a cluster the URL would
  * point at a server, same code path. */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = Some("org.apache.derby.iapi.jdbc.AutoloadedDriver")

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { c.createStatement().execute(sql): Unit }
    catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
    finally c.close()
  }

  private def dropIfExists(table: String): Unit = {
    val c = DriverManager.getConnection(url)
    try c.createStatement().execute(s"DROP TABLE $table"): Unit
    catch { case _: java.sql.SQLException => () } // absent: fine
    finally c.close()
  }

  test("append + read round-trip through a real JDBC engine") {
    import spark.implicits._
    dropIfExists("rt")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("k", "name", "v")
    Jdbc.append(df, url, "rt", batchSize = 2, driver = driver)
    val back = Jdbc.read(spark, url, "rt", driver)
      .as[(Long, String, Double)].collect().toSet
    assert(back === Set((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
  }

  test("filters and projections push down into the remote query") {
    import spark.implicits._
    dropIfExists("pushme")
    Jdbc.append((1L to 100L).map(i => (i, i * 2.0)).toDF("k", "v"),
      url, "pushme", driver = driver)
    val q = Jdbc.read(spark, url, "pushme", driver)
      .filter($"k" > 90L).select($"k")
    // the filter must reach the JDBC scan (remote WHERE), not run in
    // Spark after shipping all 100 rows; the SELECT list must be pruned
    val scan = q.queryExecution.executedPlan.toString()
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(k,90)"),
      scan)
    assert(!scan.contains("ReadSchema: struct<k:bigint,v:double>"), scan)
    assert(q.as[Long].collect().toSet === (91L to 100L).toSet)
  }

  test("partitioned parallel read: n disjoint range queries, same rows") {
    import spark.implicits._
    dropIfExists("part")
    Jdbc.append((1L to 1000L).map(i => (i, s"r$i")).toDF("k", "name"),
      url, "part", driver = driver)
    val df = Jdbc.readPartitioned(spark, url, "part", "k",
      lower = 1L, upper = 1000L, numPartitions = 8, driver = driver)
    assert(df.rdd.getNumPartitions === 8)
    assert(df.count() === 1000L)
    // the range split is a parallelism hint, never a filter: rows
    // outside [lower, upper) still arrive via the unbounded edges
    val df2 = Jdbc.readPartitioned(spark, url, "part", "k",
      lower = 400L, upper = 600L, numPartitions = 4, driver = driver)
    assert(df2.count() === 1000L)
  }

  test("batched upsert: updates existing keys, inserts new, idempotent replay") {
    import spark.implicits._
    dropIfExists("ups")
    exec("CREATE TABLE ups (k BIGINT NOT NULL PRIMARY KEY, grp VARCHAR(10), v DOUBLE)")
    Jdbc.append(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("k", "grp", "v"), url, "ups", driver = driver)

    // 2 updated (keys 2, 3), 2 inserted (keys 4, 5); batchSize=2 forces
    // multiple update/insert batch flushes inside one partition
    val delta = Seq((2L, "a", 20.0), (3L, "b", 30.0), (4L, "c", 4.0),
      (5L, "c", 5.0)).toDF("k", "grp", "v").repartition(3)
    Jdbc.upsert(delta, url, "ups", keyCols = Seq("k"), batchSize = 2,
      driver = driver)
    def state() = Jdbc.read(spark, url, "ups", driver)
      .as[(Long, String, Double)].collect().toSet
    val expected = Set((1L, "a", 1.0), (2L, "a", 20.0), (3L, "b", 30.0),
      (4L, "c", 4.0), (5L, "c", 5.0))
    assert(state() === expected)

    // replay IS the crash recovery (same contract as Pipeline.upsert):
    // every row takes the UPDATE path, nothing duplicates
    Jdbc.upsert(delta, url, "ups", keyCols = Seq("k"), batchSize = 2,
      driver = driver)
    assert(state() === expected)

    // composite keys: (grp, k) — and the PK guards against a broken
    // upsert ever inserting a duplicate silently
    Jdbc.upsert(delta, url, "ups", keyCols = Seq("grp", "k"), batchSize = 2,
      driver = driver)
    assert(state() === expected)
  }

  test("catalog mode: aggregates push down INTO the warehouse query") {
    import spark.implicits._
    dropIfExists("agg_push")
    // explicit DDL: Spark's Derby dialect writes StringType as CLOB,
    // which Derby refuses to GROUP BY — the grouping column must be
    // VARCHAR for the pushed query to be valid remotely
    exec("CREATE TABLE agg_push (k BIGINT, grp VARCHAR(5), v DOUBLE)")
    Jdbc.append((1L to 200L).map(i => (i, if (i % 2 == 0) "a" else "b", i * 1.0))
      .toDF("k", "grp", "v"), url, "agg_push", driver = driver)
    // Spark's DSv2 JDBC catalog compiles MIN/MAX/COUNT/SUM + GROUP BY
    // into the remote SELECT — at warehouse scale the engine ships the
    // aggregation instead of the rows (the property the reference leaned
    // on BigQuery for). Derby uppercases unquoted identifiers.
    val confs = Map(
      "spark.sql.catalog.graftdb" ->
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
      "spark.sql.catalog.graftdb.url" -> url,
      "spark.sql.catalog.graftdb.driver" ->
        "org.apache.derby.iapi.jdbc.AutoloadedDriver",
      "spark.sql.catalog.graftdb.pushDownAggregate" -> "true")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = spark.sql(
        """SELECT grp, COUNT(*) AS n, SUM(v) AS s
          |FROM graftdb.APP.AGG_PUSH GROUP BY grp ORDER BY grp""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString()
      assert(plan.contains("PushedAggregates"), plan)
      assert(plan.toUpperCase.contains("COUNT") && plan.toUpperCase.contains("SUM"),
        plan)
      assert(q.as[(String, Long, Double)].collect().toSeq === Seq(
        ("a", 100L, (2 to 200 by 2).map(_.toDouble).sum),
        ("b", 100L, (1 to 199 by 2).map(_.toDouble).sum)))
    } finally confs.keys.foreach(spark.conf.unset)
  }

  test("upsert refuses frames without keys or without non-key columns") {
    import spark.implicits._
    val df = Seq((1L, 2.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Jdbc.upsert(df, url, "t", keyCols = Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      Jdbc.upsert(df, url, "t", keyCols = Seq("k", "v"))
    }
  }
}
