package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoinApi
import graft.util.Tables

/** The custom-operator tier (plans.AsOfJoin + AsOfJoinExec +
  * AsOfJoinStrategy): the native single-pass merge must return exactly
  * the oracle-verified union+window formulation's rows, and its plan
  * must be the co-partitioned exec with no Union/Window machinery. */
class AsOfJoinSpec extends SparkSpec {

  private def native = {
    val e = Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    AsOfJoinApi.asof(e, o,
      e("user_id"), o("o_custkey"), e("ts"), o("o_orderdate"),
      tieBreak = Seq(o("o_orderkey")))
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("asof_orderkey"),
        to_date(col("o_orderdate")).as("asof_date"))
      .orderBy(col("event_id"))
  }

  test("native as-of exec returns exactly the union+window rows") {
    val expected = SparkEntry.all("q_join_asof").fn(spark, sf).collect()
    val got = native.collect()
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g === e) }
  }

  test("plan is AsOfJoinExec with co-partitioning, no Union/Window") {
    val p = native.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Union"), p)
    assert(!p.contains("Window"), p)
  }

  test("EnsureRequirements repairs adversarial input partitioning") {
    import spark.implicits._
    // children arrive partitioned by the WRONG keys — the exec's
    // requiredChildDistribution must force re-exchange on the join key
    val e = Tables.events(spark, sf).select($"event_id", $"user_id", $"ts")
      .repartition(7, $"event_id")
    val o = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      .repartition(3, $"o_orderdate")
    val res = AsOfJoinApi.asof(e, o,
      e("user_id"), o("o_custkey"), e("ts"), o("o_orderdate"),
      tieBreak = Seq(o("o_orderkey")))
      .select($"event_id", $"o_orderkey").orderBy($"event_id")
    val expected = SparkEntry.all("q_join_asof").fn(spark, sf)
      .select(col("event_id"), col("asof_orderkey")).orderBy(col("event_id"))
    assert(res.collect().toSeq === expected.collect().toSeq)
  }

  test("equal timestamps: order visible to event, highest tie-break wins") {
    import spark.implicits._
    val e = Seq((1L, 5L, "2024-01-05 00:00:00"))
      .toDF("event_id", "uid", "t").withColumn("t", to_timestamp($"t"))
    val o = Seq(
      (10L, 5L, "2024-01-05 00:00:00"), // same instant as the event
      (11L, 5L, "2024-01-05 00:00:00"), // tie — higher key must win
      (12L, 5L, "2024-01-06 00:00:00")) // future — invisible
      .toDF("ok", "ouid", "ot").withColumn("ot", to_timestamp($"ot"))
    val r = AsOfJoinApi.asof(e, o, e("uid"), o("ouid"), e("t"), o("ot"),
      tieBreak = Seq(o("ok")))
      .select($"ok").as[Long].collect()
    assert(r.toSeq === Seq(11L)) // inclusive <=, last-in-sort-order wins
  }

  test("null join keys / timestamps follow SQL semantics (never match, no crash)") {
    import spark.implicits._
    val e = Seq(
      (1L, Some(10L), Some("2024-03-01 00:00:00")),
      (2L, None, Some("2024-03-01 00:00:00")),      // null key → null-padded
      (3L, Some(10L), None),                        // null time → null-padded
      (4L, Some(10L), Some("2024-04-01 00:00:00")))
      .toDF("event_id", "uid", "t").withColumn("t", to_timestamp($"t"))
    val o = Seq(
      (100L, Some(10L), Some("2024-02-01 00:00:00")),
      (101L, None, Some("2024-01-01 00:00:00")),    // null key — never matches
      (102L, Some(10L), None),                      // null time — never matches
      (103L, Some(10L), Some("2024-03-15 00:00:00")))
      .toDF("ok", "ouid", "ot").withColumn("ot", to_timestamp($"ot"))
    val r = AsOfJoinApi.asof(e, o, e("uid"), o("ouid"), e("t"), o("ot"),
      tieBreak = Seq(o("ok")))
      .select($"event_id", $"ok").orderBy($"event_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(r.toSeq === Seq(
      1L -> Some(100L), 2L -> None, 3L -> None, 4L -> Some(103L)))
  }

  test("exec output survives a direct shuffle/sort parent (UnsafeRow contract)") {
    import spark.implicits._
    // no projection between the exec and the exchange: the sort's shuffle
    // serializer requires UnsafeRow — a reused mutable JoinedRow would
    // ClassCastException or corrupt buffered rows
    val e = Tables.events(spark, sf).select($"event_id", $"user_id", $"ts")
    val o = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val joined = AsOfJoinApi.asof(e, o,
      e("user_id"), o("o_custkey"), e("ts"), o("o_orderdate"),
      tieBreak = Seq(o("o_orderkey")))
    val viaShuffle = joined.orderBy($"o_orderkey".desc_nulls_last, $"event_id")
      .collect()
    assert(viaShuffle.length === joined.count())
    // a repartition parent also round-trips the rows through serialization
    val viaRepart = joined.repartition(5, $"o_orderkey").collect()
    assert(viaRepart.map(_.getLong(0)).sorted.toSeq ===
      viaShuffle.map(_.getLong(0)).sorted.toSeq)
  }

  test("handles events before any order and empty right side") {
    import spark.implicits._
    val e = Seq((1L, 10L, "2024-01-01 00:00:00"), (2L, 10L, "2024-03-01 00:00:00"))
      .toDF("event_id", "uid", "t").withColumn("t", to_timestamp($"t"))
    val o = Seq((100L, 10L, "2024-02-01 00:00:00"))
      .toDF("ok", "ouid", "ot").withColumn("ot", to_timestamp($"ot"))
    val r = AsOfJoinApi.asof(e, o, e("uid"), o("ouid"), e("t"), o("ot"))
      .select($"event_id", $"ok").orderBy($"event_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(r.toSeq === Seq(1L -> None, 2L -> Some(100L)))

    val empty = o.filter($"ok" < 0)
    val r2 = AsOfJoinApi.asof(e, empty, e("uid"), empty("ouid"), e("t"), empty("ot"))
      .select($"event_id", $"ok").collect()
    assert(r2.length === 2)
    assert(r2.forall(_.isNullAt(1)))
  }

  test("PushFilterThroughAsOfJoin: left-only filters reach the left scan, " +
    "key predicates transfer to the right side") {
    import spark.implicits._
    val e = Tables.events(spark, sf).select($"event_id", $"user_id", $"ts")
    val o = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val filtered = AsOfJoinApi.asof(e, o,
        e("user_id"), o("o_custkey"), e("ts"), o("o_orderdate"),
        tieBreak = Seq(o("o_orderkey")))
      .filter($"user_id" === 7L && $"event_id" > 100L)
    val opt = filtered.queryExecution.optimizedPlan
    // both conjuncts moved below the custom node …
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    import graft.plans.AsOfJoin
    val aj = opt.collectFirst { case j: AsOfJoin => j }
    assert(aj.isDefined, opt.toString)
    assert(opt.collectFirst {
      case Filter(_, _: AsOfJoin) => true }.isEmpty,
      "no filter may remain above the as-of join\n" + opt)
    // … the key predicate ALSO prunes the right side
    val rightFiltered = aj.get.right.collectFirst {
      case f: Filter => f.condition.toString }
    assert(rightFiltered.exists(_.contains("o_custkey")),
      s"right side not pruned: ${aj.get.right}")
    // and the physical left scan carries pushed filters
    val phys = filtered.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters: [IsNotNull(user_id)") ||
      phys.contains("EqualTo(user_id,7)"), phys)
    // results are identical to filtering the oracle-pinned formulation
    val expected = SparkEntry.all("q_join_asof").fn(spark, sf)
      .filter($"user_id" === 7L && $"event_id" > 100L)
      .select($"event_id", $"asof_orderkey").orderBy($"event_id").collect()
    val got = filtered
      .select($"event_id", $"o_orderkey".as("asof_orderkey"))
      .orderBy($"event_id").collect()
    assert(got.toSeq === expected.toSeq)
  }
}
