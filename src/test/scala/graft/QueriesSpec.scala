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

  test("EVERY declared query is oracle-checked — zero rows-only rows " +
    "(the r8 full-coverage invariant; a new no-oracle query is a " +
    "deliberate decision, not a default)") {
    val missing = SparkEntry.all.collect {
      case (name, d) if d.oracle.isEmpty => name
    }
    assert(missing.isEmpty,
      s"queries without a DuckDB oracle: ${missing.mkString(", ")} — " +
        "the full declared surface has been oracle-checked since r8 " +
        "(envelope booleans for sketches, HUGEINT folds for media); " +
        "add an oracle or document the regression in SURVEY §2.11")
  }
}
