package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities (SURVEY.md §7.5 risk register; the 100 TB design
  * mandate): bucketed co-located joins and salted skew handling. These
  * are engine patterns, not declared queries — exercised by ScaleSpec,
  * which asserts the resulting physical plans (no exchange on bucketed
  * joins; bounded partition width on salted aggregations).
  */
object Scale {

  /** Write both sides bucketed by the join key into the session catalog.
    * A later join on that key sort-merges WITHOUT either exchange: at
    * 100 TB this turns the fact⋈fact shuffle (the dominant cost) into
    * co-located per-bucket merges. Bucket count is fixed at write time —
    * size it to (table size / target partition size), power of two. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. Caller asserts the
    * plan: with equal bucket counts there is no ShuffleExchange. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Salted two-phase aggregation: pre-aggregate on (key, salt) so a
    * hot key's rows split across `salts` reducers, then combine the
    * partials. Identical result to a direct groupBy-agg for any
    * sum/count-decomposable aggregate; use when one key dominates the
    * distribution badly enough that AQE skew handling isn't available
    * (it only splits JOIN partitions, not aggregation keys).
    *
    * partial: map each value column to its (salted) partial aggregate.
    * merge:   combine partials per key.
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      salts: Int,
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy(key.as("_k"), col("_salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("_k"))
      .agg(merge.head, merge.tail: _*)
  }

  /** Binned range join: `big.v ∈ [small.lo, small.hi)` without a
    * nested-loop. Each big row maps to bin floor(v/w); each small
    * interval is replicated to every bin it covers (sequence — intervals
    * are bounded, so replication is |interval|/w per row); the join is
    * then EQUI on the bin plus the residual range filter. At 100 TB this
    * is the strategy when the interval side is too big to broadcast:
    * one keyed shuffle instead of O(n·m) loops. Result rows are
    * identical to the plain non-equi join (ScaleSpec pins it). */
  def binnedRangeJoin(
      big: DataFrame, small: DataFrame,
      bigValue: String, lo: String, hi: String,
      binWidth: Double): DataFrame = {
    val binned = big.withColumn("_bin",
      floor(col(bigValue) / binWidth).cast("long"))
    val replicated = small.withColumn("_bin",
      explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    binned.join(replicated, Seq("_bin"))
      .filter(col(bigValue) >= col(lo) && col(bigValue) < col(hi))
      .drop("_bin")
  }

  /** Salted broadcast-side replication for a skewed equi join: explode
    * the small side `salts`× with a salt column, salt the big side's key
    * randomly-but-deterministically, join on (key, salt). Splits a hot
    * key across `salts` tasks; result identical to the unsalted join. */
  def saltedJoin(
      big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(hash(col(bigKey), spark_partition_id(), monotonically_increasing_id()),
        lit(salts)))
    val replicatedSmall = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicatedSmall,
      saltedBig(bigKey) === replicatedSmall(smallKey) &&
        saltedBig("_salt") === replicatedSmall("_salt"))
      .drop("_salt")
  }

  /** Skew-resistant connected components: the alternating large-star /
    * small-star algorithm (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14 — public). Each round rewires every
    * edge toward its neighborhood minimum:
    *   large-star: for node u with m = min(Γ(u) ∪ {u}), each neighbor
    *               x > u re-links as (x, m);
    *   small-star: each neighbor x < u re-links as (x, m), plus (u, m).
    * The edge set converges in O(log n) rounds to stars centered at each
    * component's minimum id. Versus min-label propagation (the
    * q_dedup_canonical loop) the hot structures stay skew-safe: the
    * neighborhood minimum is a map-side-combinable `min` aggregate (a
    * 10^9-degree hub never materializes on one reducer), and a hub's
    * spokes re-link directly to the minimum in one round instead of
    * re-shuffling the hub key once per propagation round for
    * diameter-many rounds.
    *
    * `pairs` = undirected edges (aCol, bCol), any orderable integer ids;
    * self-loops and duplicates tolerated. Returns (node, lbl) — every
    * node that appears in an edge, labeled with its component's min id.
    * Isolated nodes never appear (same contract as the propagation
    * loop: they are their own canonical by definition). */
  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative dimension columns — the multi-dimensional clustering
    * key for data skipping. Range-clustering a table by ONE key (see
    * [[graft.etl.Pipeline.clusteredWrite]]) makes that key's file-level
    * min/max tight but leaves every OTHER dimension full-range per
    * file; sorting by the interleaved key makes file min/max tight in
    * BOTH dimensions at once (each 2²ᵏ-aligned z-range is an exact
    * 2ᵏ×2ᵏ tile — pinned in ScaleSpec), so predicates on either
    * column prune files. Pure bit arithmetic (32 OR-terms for 16-bit
    * dims), codegen-friendly, replayable in any engine — the oracle
    * SQL is generated from the same term list by [[zOrderSql]]. */
  def zOrderKey(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** The identical interleave as engine-neutral SQL over `x`/`y`
    * sub-expressions — keeps the oracle bit-for-bit the same formula. */
  def zOrderSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Wedge enumeration with a witness hub cap — the scale armor for
    * common-neighbor / Adamic-Adar link prediction. Input: a SYMMETRIC
    * edge set (uCol, vCol). Output: one row per wedge a–w–b with a < b,
    * enumerated ONLY at witnesses w with deg(w) ≤ cap, carrying the
    * witness degree.
    *
    * Why a cap and not orientation: unlike triangle counting (where
    * degree-ordered orientation bounds fan-out at O(√|E|) because each
    * triangle needs counting once), every wedge here IS an output
    * contribution — CN counts all of them — so no orientation trick can
    * shrink the Σ deg(w)² wedge mass. The standard large-graph fix is
    * dropping hub witnesses: a witness of degree d costs d(d-1)/2 wedge
    * rows yet contributes only ~1/ln d of Adamic-Adar evidence per pair
    * — maximum cost, minimum signal. With the cap, per-witness fan-out
    * is ≤ cap(cap-1)/2 and a degree-10⁶ celebrity node contributes ZERO
    * wedge rows instead of ~10¹². The degree filter lands BEFORE the
    * self-join, so the pruned fan-out never materializes. */
  def cappedWedges(sym: DataFrame, uCol: String, vCol: String,
      cap: Long): DataFrame = {
    val deg = sym.groupBy(col(uCol).as("w"))
      .agg(count(lit(1)).as("degree"))
      .filter(col("degree") <= cap)
    sym.select(col(uCol).as("a"), col(vCol).as("w"))
      .join(deg, "w")
      .join(sym.select(col(uCol).as("w"), col(vCol).as("b")), "w")
      .filter(col("a") < col("b"))
      .select(col("a"), col("w"), col("b"), col("degree"))
  }

  def starCC(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 64): DataFrame = {
    val init = pairs
      .select(least(col(aCol), col(bCol)).cast("long").as("lo"),
        greatest(col(aCol), col(bCol)).cast("long").as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    def sym(e: DataFrame): DataFrame =
      e.select(col("lo").as("u"), col("hi").as("v"))
        .unionByName(e.select(col("hi").as("u"), col("lo").as("v")))
    // m(u) = min(Γ(u) ∪ {u}) — partial-aggregatable, no reducer ever
    // holds a whole neighborhood
    def nbhdMin(s: DataFrame): DataFrame =
      s.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
    def canon(e: DataFrame): DataFrame =
      e.select(least(col("x"), col("m")).as("lo"),
        greatest(col("x"), col("m")).as("hi"))
        .filter(col("lo") =!= col("hi")).distinct()
    // each round references the prior edge set ~10× (two sym()s, the
    // nbhdMin joins, the delta union) — an eager localCheckpoint
    // truncates the LOGICAL lineage per round, or analysis alone goes
    // exponential in rounds (the cache only truncates execution). At
    // cluster scale swap for reliable checkpointing to shared storage.
    var cur = init.localCheckpoint(true)
    var done = false
    var iter = 0
    while (!done && iter < maxIter) {
      val sL = sym(cur)
      val large = canon(sL.filter(col("v") > col("u"))
        .join(nbhdMin(sL), "u")
        .select(col("v").as("x"), col("m")))
      val sS = sym(large)
      val mS = nbhdMin(sS)
      val small = canon(
        sS.filter(col("v") < col("u")).join(mS, "u")
          .select(col("v").as("x"), col("m"))
          .unionByName(mS.select(col("u").as("x"), col("m"))))
      val next = small.localCheckpoint(true)
      // converged ⟺ symmetric difference empty: an edge in exactly one
      // of {cur, next} surfaces as a group of count 1 (both are distinct
      // sets) — one action per round
      val delta = next.unionByName(cur)
        .groupBy(col("lo"), col("hi")).count()
        .filter(col("count") === 1).count()
      cur = next
      done = delta == 0
      iter += 1
    }
    require(done, s"starCC did not converge in $iter rounds")
    val labels = cur.select(col("hi").as("node"), col("lo").as("lbl"))
      .unionByName(cur.select(col("lo").as("node"), col("lo").as("lbl")))
      .distinct()
    labels
  }

  /** Distributed running (prefix) sum — the two-level scan that replaces
    * `Window.partitionBy(group).orderBy(order)`: that window funnels every
    * row of a group through ONE task's sort (with ~10 language groups at
    * the 100 TB target, a single-core scan of each language's whole
    * share). Here the cumsum is computed within (group, block) slices —
    * block = ⌊order/blockSpan⌋, so parallelism is |blocks|, not |groups| —
    * then per-block totals (|blocks| tiny rows, not row data) are
    * cumsum'd per group and the exclusive block offset is joined back on
    * (group, block), a key the in-block window already partitioned by, so
    * the join adds no exchange on the data side. Result is bit-identical
    * to the single window: within a block the order is `order`, blocks
    * are `order`-monotone, and long addition is associative.
    *
    * Returns df + `cumCol` = running sum of `valueCol` INCLUSIVE of the
    * current row, in (group, order) order. `order` and `value` must be
    * numeric and non-null; ties in `order` within a block are resolved by
    * the window's stable ordering, and the row-level cumsum at a tie is
    * order-dependent — pass a unique `order` key (same caveat as any
    * running-total window). */
  def blockedPrefixSum(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      valueCol: String,
      cumCol: String,
      blockSpan: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(blockSpan > 0, s"blockSpan must be positive; got $blockSpan")
    val withBlk = df.withColumn("_blk",
      floor(col(orderCol) / blockSpan).cast("long"))
    val wIn = Window.partitionBy(col(groupCol), col("_blk"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBlock = withBlk.withColumn("_incum", sum(col(valueCol)).over(wIn))
    val wBlocks = Window.partitionBy(col(groupCol)).orderBy(col("_blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withBlk.groupBy(col(groupCol), col("_blk"))
      .agg(sum(col(valueCol)).as("_btot"))
      .withColumn("_boff", coalesce(sum(col("_btot")).over(wBlocks), lit(0L)))
      .select(col(groupCol), col("_blk"), col("_boff"))
    inBlock.join(offsets, Seq(groupCol, "_blk"))
      .withColumn(cumCol, col("_incum") + col("_boff"))
      .drop("_incum", "_boff", "_blk")
  }

  /** Distributed exact rank-pick: for each group, return ONLY the rows
    * at the requested (1-based) sorted ranks of `valCol` — the
    * selection step of exact percentiles/medians WITHOUT a per-group
    * reducer. A window `row_number` over a 3-value group key sorts each
    * group on ONE task (memory-safe via spill, but 3 tasks on a 1000-
    * executor cluster); here the sort is a global RANGE sort over
    * (group, value) — every core sorts a slice — and global ranks come
    * from `zipWithIndex` (per-partition counts + offset, one extra tiny
    * job) minus each group's start offset. Rank-of-equal-values is
    * arbitrary but the VALUE at rank k is unique, so results don't
    * depend on partition boundaries or tie placement.
    *
    * The per-group totals are collected to the driver to compute start
    * offsets and the requested rank sets — |groups| scalar rows, the
    * same class of driver-side metadata read as a range partitioner's
    * sample or the watermark scalar (SURVEY.md §7.5); row data never
    * leaves the cluster.
    *
    * `ranksFor` maps each group's row count n to the ranks wanted
    * (e.g. percentile interpolation needs ⌊p·(n−1)⌋+1 and ⌈p·(n−1)⌉+1).
    * Returns (group, rn, v) — one row per requested rank.
    *
    * `precounted`: per-group totals in SPARK SORT ORDER of the group
    * key, if the caller already aggregated them — skips rankPick's own
    * counts job. Order matters: offsets are cumulative in the global
    * sort's group order, so the list must come from an `orderBy` on the
    * SAME engine (e.g. `df.groupBy(g).count().orderBy(g).collect()`),
    * never a driver-side re-sort — Scala's UTF-16 String ordering and
    * Spark's UTF8 binary ordering disagree on supplementary-plane
    * characters. */
  /** ONE guarded per-group counts job in SPARK sort order — the
    * watermark-class driver scalar read shared by the rank-pick call
    * sites (passed back as `precounted`) and by [[rankPickBy]]'s own
    * fallback. The maxGroups ceiling is enforced with a
    * limit(maxGroups+1) fetch (TakeOrderedAndProject — no full collect
    * on the failure path either), failing fast instead of silently
    * becoming a driver bottleneck on a high-cardinality key. */
  def groupCounts(df: DataFrame, groupCol: String,
      maxGroups: Int = 100000): Seq[(String, Long)] = {
    val rows = df.groupBy(col(groupCol)).count().orderBy(col(groupCol))
      .limit(maxGroups + 1)
      .collect().toSeq.map(r => r.getString(0) -> r.getLong(1))
    require(rows.size <= maxGroups,
      s"groupCounts holds one (group, count) pair per group on the " +
        s"driver; '$groupCol' has >$maxGroups groups — use a distributed " +
        "window rank per group instead, or raise maxGroups deliberately")
    rows
  }

  def rankPick(
      spark: SparkSession,
      df: DataFrame,
      groupCol: String,
      valCol: String,
      ranksFor: Long => Seq[Long],
      precounted: Option[Seq[(String, Long)]] = None,
      maxGroups: Int = 100000): DataFrame =
    rankPickBy(spark, df, groupCol, valCol, (_, n) => ranksFor(n), precounted,
      maxGroups)

  /** [[rankPick]] with GROUP-AWARE target ranks — lets several logical
    * rank-picks share ONE global sort: melt the measures into a single
    * (composite group, value) frame and give each composite its own rank
    * set (q_percentile fuses its two measures this way, halving the
    * sort/zipWithIndex job count). */
  def rankPickBy(
      spark: SparkSession,
      df: DataFrame,
      groupCol: String,
      valCol: String,
      ranksFor: (String, Long) => Seq[Long],
      precounted: Option[Seq[(String, Long)]] = None,
      maxGroups: Int = 100000): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    require(df.schema(groupCol).dataType == StringType,
      s"rankPick groups by a string key; got ${df.schema(groupCol).dataType.sql}" +
        " — cast the group column first")
    // group order must be SPARK's sort order (orderBy inside
    // groupCounts), not a driver-side sortBy — see `precounted`
    // scaladoc. The (key, count) offset table lives on the driver — the
    // documented watermark-class scalar read, guarded by maxGroups
    // inside groupCounts (VERDICT r4 item 4).
    // null (group, value) rows drop — SQL percentile semantics skip
    // null measures, and the zipWithIndex pipeline's non-null schema
    // would otherwise fail on them. CONTRACT: a caller-supplied
    // `precounted` table must count these CLEAN rows (count the frame
    // you'd feed a percentile, not the raw table) — a mismatched count
    // shifts every rank offset after the first affected group.
    val clean = df.filter(col(groupCol).isNotNull && col(valCol).isNotNull)
    val counts: Seq[(String, Long)] =
      precounted.getOrElse(groupCounts(clean, groupCol, maxGroups))
    require(counts.size <= maxGroups,
      s"rankPick precounted table has ${counts.size} groups > maxGroups=$maxGroups")
    val schema = StructType(Seq(
      StructField(groupCol, StringType, nullable = false),
      StructField("rn", LongType, nullable = false),
      StructField(valCol, DoubleType, nullable = false)))
    if (counts.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    // each group's rows start at the cumulative count of earlier groups
    val offsets = counts.scanLeft(("", 0L)) { case ((_, acc), (g, n)) =>
      (g, acc + n)
    }.sliding(2).collect { case Seq((_, off), (g, _)) => g -> off }.toSeq
    val targetRows: Seq[(String, Long)] = counts.flatMap { case (g, n) =>
      ranksFor(g, n).toSet[Long].map(g -> _)
    }
    // Global ranks WITHOUT the former rdd.zipWithIndex round-trip (r13):
    // .rdd deserialized every sorted row out of Tungsten, the flatMap ran
    // interpreted, createDataFrame re-serialized — and zipWithIndex's
    // internal count job executed the whole range sort a SECOND time
    // (the un-cached lineage re-ran for the main job). Instead: persist
    // the sorted frame once; a range sort orders partitions by index, so
    // global rank = (rows in earlier partitions) + within-partition
    // index + 1, with the within-partition index decoded from
    // monotonically_increasing_id (pid·2³³ + row index — its documented
    // layout) and per-partition counts from one tiny cached-read job.
    // Everything stays in whole-stage codegen; the rank filter is a
    // broadcast semi join on the (group, rn) target set; the |picked|
    // result (|groups|·|ranks| rows) is localCheckpointed eagerly so the
    // sort cache can be released before the caller composes on top.
    val sorted = clean.select(col(groupCol), col(valCol).cast("double"))
      .sort(col(groupCol), col(valCol))
      .select(col(groupCol), col(valCol),
        spark_partition_id().as("_pid"),
        monotonically_increasing_id().as("_mid"))
      .persist()
    try {
      val pc = sorted.groupBy(col("_pid")).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val maxPid = if (pc.isEmpty) 0 else pc.keys.max
      val pidOff = (0 to maxPid).scanLeft(0L) { (acc, p) =>
        acc + pc.getOrElse(p, 0L)
      }.dropRight(1).zipWithIndex.map { case (off, p) => p -> off }.toMap
      import spark.implicits._
      val offDf = offsets.toDF(groupCol, "_goff")
      val tgtDf = targetRows.toDF(groupCol, "rn")
      val globalIdx = element_at(typedLit(pidOff), col("_pid")) +
        (col("_mid") - shiftleft(col("_pid").cast("long"), 33))
      val picked = sorted
        .join(broadcast(offDf), Seq(groupCol))
        .withColumn("rn", globalIdx - col("_goff") + 1L)
        .join(broadcast(tgtDf), Seq(groupCol, "rn"), "left_semi")
        .select(col(groupCol), col("rn"), col(valCol))
        .localCheckpoint(eager = true)
      picked
    } finally sorted.unpersist(): Unit
  }
}
