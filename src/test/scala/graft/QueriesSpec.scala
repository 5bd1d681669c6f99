package graft

/** Smoke every declared query on sf0.001: runs, yields rows, and its
  * oracle SQL (when declared) is non-empty. The exact value compare is
  * the driver's DuckDB gate (tools/check.py locally); this suite catches
  * runtime breakage inside `sbt test`. */
class QueriesSpec extends SparkSpec {

  SparkEntry.all.foreach { case (name, d) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = d.fn(spark, sf)
      assert(df.columns.nonEmpty, "schema must be non-empty")
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry (driver smoke contract) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query with an oracle appears in oracleSql with matching key") {
    val sqls = SparkEntry.oracleSql
    SparkEntry.all.foreach { case (name, d) =>
      assert(d.oracle.isEmpty || sqls.contains(name), s"$name oracle missing")
    }
    sqls.values.foreach(sql => assert(sql.trim.nonEmpty))
  }
}
