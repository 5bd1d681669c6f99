package graft

import org.apache.spark.sql.functions._
import graft.etl.{Checks, Pipeline}
import graft.etl.Checks._
import graft.util.Tables

/** Data-quality checks (single-pass) and the idempotent dedup-on-read
  * sink pattern. */
class ChecksSpec extends SparkSpec {

  test("all checks run in one pass and report correctly") {
    val ev = Tables.events(spark, sf)
    val report = Checks.run(ev, Seq(
      rowCount(1, 10000000),
      notNull("event_id"),
      nullRatioAtMost("value", 0.5),
      inSet("event_type", Seq("click", "view", "purchase", "signup", "error")),
      unique("event_id"),
      inRange("value", -1e6, 1e6)))
    assert(report.count() === 6)
    assert(Checks.allPassed(report), report.collect().mkString(";"))
  }

  test("violations are detected with observed values") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "b"), (2L, null)).toDF("k", "v")
    val report = Checks.run(df, Seq(
      unique("k"),       // 1 duplicate
      notNull("v"),      // 1 null
      rowCount(10, 20))) // only 3 rows
    val byName = report.collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(byName("unique_k") === (("1", false)))
    assert(byName("not_null_v") === (("1", false)))
    assert(byName("row_count_in_[10,20]") === (("3", false)))
    assert(!Checks.allPassed(report))
  }

  test("readDeduped keeps only the latest load per (date, group)") {
    import spark.implicits._
    val sink = java.nio.file.Files.createTempDirectory("graft_dedup").toString + "/t"
    def ev(v: Double) = Seq(("2024-01-01 01:00:00", "SE1", v))
      .toDF("ts", "zone", "value").withColumn("ts", to_timestamp($"ts"))
    // two loads of the SAME day (simulated duplicate append after a
    // partial-failure rerun): second load must win on read
    Pipeline.runIncremental(spark, ev(10.0), "zone", sink, java.sql.Date.valueOf("2024-01-02"))
    ev(99.0).createOrReplaceTempView("dummy") // (no-op, clarity)
    // force a duplicate by writing the same day again with a later load_date
    val daily2 = Seq(("2024-01-01", "SE1", 99.0, 1L, "2024-01-03"))
      .toDF("date", "group_key", "avg_value", "n", "load_date")
      .select($"date".cast("date"), $"group_key", $"avg_value", $"n",
        $"load_date".cast("date"))
    daily2.write.partitionBy("date").mode("append").parquet(sink)

    assert(spark.read.parquet(sink).count() === 2) // raw sink has the dup
    val deduped = Pipeline.readDeduped(spark, sink)
    assert(deduped.count() === 1)
    assert(deduped.select($"avg_value").as[Double].head() === 99.0) // latest load wins
  }
}
