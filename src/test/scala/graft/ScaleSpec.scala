package graft

import org.apache.spark.sql.functions._
import graft.ops.Scale

/** Plan-level verification of the 100 TB scale patterns: bucketed joins
  * eliminate both exchanges; salted aggregation/join give identical
  * results to their unsalted forms while splitting hot keys. */
class ScaleSpec extends SparkSpec {

  test("bucketed fact-fact join plans with NO shuffle exchange") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Scale.writeBucketed(o, "t_orders_b", "o_orderkey", 4)
    Scale.writeBucketed(l, "t_lineitem_b", "o_orderkey", 4)
    // force the fact⋈fact (sort-merge) path — at sf0.001 orders is small
    // enough to broadcast, which is the right plan at THIS size but not
    // the scale scenario under test
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      val expected = o.join(l, "o_orderkey").count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("saltedAgg == direct groupBy for sum/count, any salt count") {
    import spark.implicits._
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    val direct = l.groupBy($"l_returnflag".as("_k"))
      .agg(sum($"l_quantity").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Scale.saltedAgg(l, $"l_returnflag", salts = 8,
      partial = Seq(sum($"l_quantity").as("ps"), count(lit(1)).as("pn")),
      merge = Seq(sum($"ps").as("s"), sum($"pn").as("n")))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet === direct.keySet)
    direct.foreach { case (k, (s, n)) =>
      assert(salted(k)._2 === n)
      assert(math.abs(salted(k)._1 - s) < 1e-6) // double sum order differs
    }
  }

  test("binnedRangeJoin == plain non-equi join, and plans an equi join") {
    import spark.implicits._
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
    val p = spark.read.parquet(s"$sf/part.parquet")
      .select($"p_partkey",
        ($"p_retailprice" - 200).as("lo"), ($"p_retailprice" + 200).as("hi"))
    val plain = l.join(p, $"l_extendedprice" >= $"lo" && $"l_extendedprice" < $"hi")
    val binned = Scale.binnedRangeJoin(l, p, "l_extendedprice", "lo", "hi", 500.0)
    assert(binned.count() === plain.count())
    // row-level equality on the join keys
    val key = Seq("l_orderkey", "l_linenumber", "p_partkey")
    assert(binned.select(key.map(col): _*).except(
      plain.select(key.map(col): _*)).count() === 0)
    assert(plain.select(key.map(col): _*).except(
      binned.select(key.map(col): _*)).count() === 0)
    // the whole point: no nested loop in the binned plan
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("rankPick returns exactly the requested ranks' values per group") {
    import spark.implicits._
    // ties included: rank-of-equals is arbitrary but the VALUE at any
    // rank is unique
    val df = Seq(
      ("a", 5.0), ("a", 1.0), ("a", 3.0), ("a", 3.0), ("a", 9.0),
      ("b", 2.0), ("b", 2.0), ("b", 8.0)
    ).toDF("g", "v").repartition(4) // scatter across partitions
    val picked = Scale.rankPick(spark, df, "g", "v",
      n => Seq(1L, (n + 1) / 2, n)) // min, lower median, max
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(picked === Map(
      ("a", 1L) -> 1.0, ("a", 3L) -> 3.0, ("a", 5L) -> 9.0,
      ("b", 1L) -> 2.0, ("b", 2L) -> 2.0, ("b", 3L) -> 8.0))
    // and it agrees with the window row_number formulation on real data
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_returnflag".as("g"), $"l_quantity".cast("double").as("v"))
    val viaPick = Scale.rankPick(spark, li, "g", "v", n => Seq(1L, n / 2, n))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"v")
    val viaWindow = li.withColumn("rn", row_number().over(w).cast("long"))
      .collect().groupBy(_.getString(0))
    viaPick.foreach { case ((g, rn), v) =>
      val expect = viaWindow(g).find(_.getLong(2) == rn).get.getDouble(1)
      assert(v === expect, s"group $g rank $rn")
    }
  }

  test("rankPick fails fast above its driver-side group-cardinality cap") {
    import spark.implicits._
    // the per-group offset table is a driver-side collect — the
    // documented watermark-class scalar read. The cap makes that
    // contract mechanical: a high-cardinality group key must throw,
    // not silently funnel the group census through the driver.
    val wide = (1 to 50).map(i => (s"g$i", i.toDouble)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Scale.rankPick(spark, wide, "g", "v", n => Seq(1L), maxGroups = 10)
    }
    assert(e.getMessage.contains("maxGroups") || e.getMessage.contains("groups"))
    // precounted path enforces the same cap
    val pre = (1 to 50).map(i => (s"g$i", 1L))
    val e2 = intercept[IllegalArgumentException] {
      Scale.rankPick(spark, wide, "g", "v", n => Seq(1L),
        precounted = Some(pre), maxGroups = 10)
    }
    assert(e2.getMessage.contains("maxGroups"))
    // and below the cap the same call succeeds
    assert(Scale.rankPick(spark, wide, "g", "v", n => Seq(1L),
      maxGroups = 64).count() === 50L)
  }

  test("starCC labels == union-find ground truth: hub, chain, random, cliques") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // hub cluster (node 1000 center, 300 spokes — the skew shape),
    // a 64-node path (forces O(log) star rounds), a few dense cliques,
    // random sparse edges, duplicate + reversed + self-loop noise
    val hub = (1 to 300).map(i => (1000L, 1000L + i))
    val path = (0 until 63).map(i => (2000L + i, 2000L + i + 1))
    val cliques = (0 until 3).flatMap { c =>
      val ids = (0 to 5).map(i => 3000L + c * 10 + i)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }
    val sparse = (1 to 120).map { _ =>
      val a = rnd.nextInt(200).toLong; val b = rnd.nextInt(200).toLong; (a, b)
    }
    val noise = hub.take(5).map(_.swap) ++ Seq((42L, 42L)) ++ path.take(3)
    val edges = hub ++ path ++ cliques ++ sparse ++ noise
    // driver-side union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .filter(n => edges.exists(e => (e._1 == n || e._2 == n) && e._1 != e._2))
      .map(n => n -> find(n)).toMap
    val actual = Scale.starCC(edges.toDF("da", "db").repartition(8), "da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(actual === expected)
  }

  test("cappedWedges: hub-and-spoke skew — a 1000-degree hub witness " +
    "contributes ZERO wedge rows; non-hub wedges are exact") {
    import spark.implicits._
    // One celebrity node (id 0, degree 1000) plus a 10-clique of normal
    // nodes (ids 10000-10009, degree 9 each, all ≤ cap). Uncapped, the
    // hub alone would fan out 1000*999/2 = 499,500 wedge rows; with the
    // cap, the plan's self-join never sees it.
    val hubEdges = (1L to 1000L).map(i => (0L, i))
    val cliqueIds = (0 until 10).map(i => 10000L + i)
    val cliqueEdges = for (a <- cliqueIds; b <- cliqueIds if a < b) yield (a, b)
    val pairs = (hubEdges ++ cliqueEdges).toDF("da", "db")
    val sym = pairs.select($"da".as("u"), $"db".as("v"))
      .unionByName(pairs.select($"db".as("u"), $"da".as("v")))
    val wedges = Scale.cappedWedges(sym, "u", "v", cap = 64L).cache()
    try {
      // no wedge is witnessed at the hub
      assert(wedges.filter($"w" === 0L).count() === 0)
      // spokes (degree 1) witness nothing; each clique node (degree 9)
      // witnesses C(9,2)=36 wedges → 360 total. Each spoke-hub wedge is
      // gone: total == clique wedges only.
      assert(wedges.count() === 360L)
      // every clique pair {a,b} has exactly 8 common non-hub witnesses
      val cn = wedges.groupBy($"a", $"b").count().collect()
      assert(cn.length === 45 && cn.forall(_.getLong(2) === 8L))
      // degree column carries the true witness degree
      assert(wedges.select($"degree").distinct().as[Long].collect().toSet === Set(9L))
    } finally wedges.unpersist()
  }

  test("starCC and blockedPrefixSum tolerate empty and degenerate input") {
    import spark.implicits._
    // empty edge set → empty labels (no hang, no exception)
    val empty = Scale.starCC(Seq.empty[(Long, Long)].toDF("da", "db"), "da", "db")
    assert(empty.count() === 0)
    // self-loops only → still empty (no real edges)
    val selfOnly = Scale.starCC(Seq((5L, 5L), (9L, 9L)).toDF("da", "db"), "da", "db")
    assert(selfOnly.count() === 0)
    // single edge → two nodes labeled with the min
    val one = Scale.starCC(Seq((4L, 2L)).toDF("da", "db"), "da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === Map(2L -> 2L, 4L -> 2L))
    // prefix sum over an empty frame → empty with the cum column present
    val emptyPs = Scale.blockedPrefixSum(
      Seq.empty[(String, Long, Long)].toDF("g", "ord", "v"), "g", "ord", "v", "cum", 16L)
    assert(emptyPs.columns.contains("cum") && emptyPs.count() === 0)
  }

  test("blockedPrefixSum == single-window running sum, hub group included") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // skewed synthetic stream: group "hub" holds ~80% of all rows, ids
    // are sparse/non-contiguous, values vary — the shape the two-level
    // scan exists for
    val rows = (0 until 400).map(i => ("hub", i.toLong * 3 + 1, (i % 17 + 1).toLong)) ++
      (0 until 60).map(i => ("b", i.toLong * 7, (i % 5 + 1).toLong)) ++
      (0 until 40).map(i => ("c", i.toLong, 2L))
    val df = rows.toDF("g", "ord", "v").repartition(8)
    val w = Window.partitionBy($"g").orderBy($"ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("cum", sum($"v").over(w))
      .select($"g", $"ord", $"cum")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // span 64 (many blocks), span 1 (block per id), span 1e9 (one block:
    // degenerates to the plain window) must all agree
    for (span <- Seq(64L, 1L, 1000000000L)) {
      val actual = Scale.blockedPrefixSum(df, "g", "ord", "v", "cum", span)
        .select($"g", $"ord", $"cum")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(actual === expected, s"span=$span")
    }
  }

  test("saltedJoin == plain join row-for-row") {
    import spark.implicits._
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderkey", $"o_orderstatus")
    val plain = l.join(o, $"l_orderkey" === $"o_orderkey").count()
    val salted = Scale.saltedJoin(l, o, "l_orderkey", "o_orderkey", salts = 4).count()
    assert(salted === plain)
  }

  test("zOrderKey: every 2^(2k)-aligned z-range is an exact 2^k × 2^k tile") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the data-skipping property q_zorder's stats rely on: within any
    // aligned z-range (tile = z >> 2k) BOTH dimensions' high bits are
    // constant — so per-tile (and hence per-file) min/max spans ≤ 2^k−1
    // in each dimension. k = 5 (32×32 tiles) over the real fixture.
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_partkey".as("x"), $"l_suppkey".as("y"))
    val bad = li
      .withColumn("z", Scale.zOrderKey($"x", $"y", 16))
      .groupBy(shiftright($"z", 10).as("tile"))
      .agg(countDistinct(shiftright($"x", 5)).as("dx"),
        countDistinct(shiftright($"y", 5)).as("dy"))
      .filter($"dx" =!= 1 || $"dy" =!= 1)
      .count()
    assert(bad === 0L)
    // and the key round-trips: de-interleaving recovers both inputs
    val probe = Seq((0L, 0L), (1L, 0L), (0L, 1L), (21L, 47L), (65535L, 65535L))
      .toDF("x", "y")
      .withColumn("z", Scale.zOrderKey($"x", $"y", 16))
      .as[(Long, Long, Long)].collect()
    probe.foreach { case (x, y, z) =>
      val (rx, ry) = (0 until 16).foldLeft((0L, 0L)) { case ((ax, ay), i) =>
        (ax | (((z >> (2 * i)) & 1L) << i), ay | (((z >> (2 * i + 1)) & 1L) << i))
      }
      assert((rx, ry) === ((x, y)), s"z=$z")
    }
  }

  test("AQE skew-join splits the hot partition of a shuffled join " +
    "(the runtime half of the skew armor; q_join_salted is the portable half)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one pathological key carries ~97% of the left side
      val left = spark.range(60000).select(
        when($"id" < 58000, lit(7L)).otherwise($"id").as("k"),
        $"id".as("payload"))
      val right = spark.range(2000).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = left.join(right, "k")
      // execute THIS dataframe (count() would plan a separate query and
      // leave joined's own adaptive plan unfinalized)
      val rows = joined.collect()
      // 58000 hot-key matches; the 2000 unique left keys (58000+) miss
      assert(rows.length === 58000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(3000))
      assert(p.contains("skew=true"),
        "AQE did not mark the join as skew-handled:\n" + p.take(3000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
