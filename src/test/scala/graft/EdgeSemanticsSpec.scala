package graft

import org.apache.spark.sql.functions._

/** Engine edge semantics pinned (SURVEY.md §5.2.2): NaN and signed-zero
  * normalization in grouping, NaN ordering, and null-skipping
  * aggregates — behaviors a query author relies on implicitly. */
class EdgeSemanticsSpec extends SparkSpec {

  test("grouping normalizes all NaNs to one group and -0.0 == 0.0") {
    import spark.implicits._
    val df = Seq(Double.NaN, Double.NaN, 0.0, -0.0, 1.0).toDF("v")
    val groups = df.groupBy($"v").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1))
    assert(groups.length === 3) // {NaN}, {±0.0}, {1.0}
    val nan = groups.find(_._1.isNaN).get
    assert(nan._2 === 2L)
    val zero = groups.find(g => g._1 == 0.0).get
    assert(zero._2 === 2L) // -0.0 normalized into 0.0's group
  }

  test("NaN sorts after every non-NaN value ascending") {
    import spark.implicits._
    val sorted = Seq(1.0, Double.NaN, -1.0, Double.PositiveInfinity)
      .toDF("v").orderBy($"v").as[Double].collect()
    assert(sorted(0) === -1.0)
    assert(sorted(1) === 1.0)
    assert(sorted(2).isInfinity)
    assert(sorted(3).isNaN)
  }

  test("aggregates skip nulls but propagate NaN") {
    import spark.implicits._
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    assert(df.agg(sum($"v")).as[Double].head() === 4.0)   // null skipped
    assert(df.agg(avg($"v")).as[Double].head() === 2.0)   // count excludes null
    assert(df.agg(count($"v")).as[Long].head() === 2L)
    val withNaN = Seq(1.0, Double.NaN).toDF("v")
    assert(withNaN.agg(sum($"v")).as[Double].head().isNaN) // NaN poisons
  }

  test("null ordering: nulls first asc / last desc by default") {
    import spark.implicits._
    val df = Seq(Some(2.0), None, Some(1.0)).toDF("v")
    val asc = df.orderBy($"v").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(asc.toSeq === Seq(None, Some(1.0), Some(2.0)))
    val desc = df.orderBy($"v".desc).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(desc.toSeq === Seq(Some(2.0), Some(1.0), None))
  }

  test("empty input: grouped agg yields zero rows, global agg yields one") {
    import spark.implicits._
    val empty = Seq.empty[(String, Double)].toDF("k", "v")
    assert(empty.groupBy($"k").agg(sum($"v")).count() === 0)
    val global = empty.agg(sum($"v"), count(lit(1))).collect().head
    assert(global.isNullAt(0)) // SUM of nothing is null, not 0
    assert(global.getLong(1) === 0L)
  }
}
