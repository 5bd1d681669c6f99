package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe (dev tool, BASELINE.md r8): synthesizes ×N copies of
  * the sf fixture tables (keys shifted; document token space made
  * replica-disjoint so near-dup candidate graphs grow LINEARLY, the
  * representative corpus shape) and times flagship operators at each
  * factor, fitting the growth exponent α in t(N) ≈ t(1)·N^α between
  * the smallest and largest factor.
  *
  * This is the direct evidence for the 100 TB design claims: an
  * operator whose plan is linear (scan-bound agg, LSH-bucketed dedup,
  * broadcast-side topk, hub-capped wedges) must read α ≈ 1 on a
  * single box while per-core throughput holds; a hidden all-pairs or
  * driver bottleneck reads α ≈ 2. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.ScaleProbe 1 2 4 8"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    // the probe's synthesized ×N dirs are throwaway — publishing their
    // heavy intermediates to the cross-session FixtureCache would only
    // pollute it (and hide the build cost the probe is measuring).
    // SPARK_GRAFT_PROBE_DISK_MEMO=true flips the experiment (VERDICT
    // r12 item 6): the cache stays ON against a throwaway root, the
    // warm pass pays each ×N dir's eager publish, and the timed reps
    // then measure the CONSUMER read path over the published bucketed
    // tables — the α of the bucketed-cache read shape itself.
    if (sys.env.get("SPARK_GRAFT_PROBE_DISK_MEMO").exists(_.toBoolean))
      sys.props("graft.cacheDir") = java.nio.file.Files
        .createTempDirectory("graft_probe_cache").toString
    else sys.props("graft.diskMemo") = "false"
    val factors = if (args.isEmpty) Seq(1, 2, 4, 8) else args.toSeq.map(_.toInt)
    val base = graft.util.Config.sfDir
    val cpus = graft.util.Config.cpus("32")
    // override the flagship set with SPARK_GRAFT_PROBE_OPS=q_a,q_b to
    // probe new operators without re-running the standing list
    val ops = graft.util.Config.probeOps
      .getOrElse(Seq("q_tpch_q1", "q_daily_avg", "q_dedup_exact",
        "q_dedup_lsh", "q_sim_topk", "q_bm25_topk", "q_link_predict"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // deterministic bucket-aware scans for the FixtureCache bucketed
      // tables (and g_bkt_*): the session-memo persist freezes the first
      // planned scan, so auto mode would freeze whichever shape the
      // first-touching query preferred
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries",
        graft.util.Config.codegenCacheEntries)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_scaleprobe")

    /** ×n replication with shifted keys. Documents additionally get a
      * replica-disjoint token space for i > 0 (every word suffixed
      * with ~i), so shingle/LSH/BM25 statistics scale the way a LARGER
      * CORPUS does (more distinct content) rather than the degenerate
      * N-fold-exact-copy way (which would inflate every near-dup
      * cluster ×N and quadratically blow up the pair stage — a
      * different experiment). */
    // SPARK_GRAFT_PROBE_STOPWORDS=true keeps replicas in the SAME token
    // space: every word's posting list / group size grows xN — the
    // stopword-heavy shape that stresses per-group aggregation state
    // (the q_inverted_index r9 collect_set OOM class). Default stays
    // replica-disjoint (the larger-corpus shape for dedup/BM25).
    val stopwordShape = graft.util.Config.probeStopwords
    def synth(n: Int): String = {
      val dir = s"$root/x$n"
      val docs = spark.read.parquet(s"$base/documents.parquet")
      val docShift = docs.agg(max($"doc_id")).head().getLong(0) + 1
      (0 until n).map { i =>
        docs.select(($"doc_id" + lit(i * docShift)).as("doc_id"),
          (if (i == 0 || stopwordShape) $"text"
           else regexp_replace($"text", " ", s"~$i ")).as("text"),
          $"lang", $"source", $"n_chars")
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      val vecShift = emb.agg(max($"vec_id")).head().getLong(0) + 1
      (0 until n).map { i =>
        emb.select(($"vec_id" + lit(i * vecShift)).as("vec_id"),
          $"embedding", $"label")
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val ev = spark.read.parquet(s"$base/events.parquet")
      val evShift = ev.agg(max($"event_id")).head().getLong(0) + 1
      (0 until n).map { i =>
        ev.select(($"event_id" + lit(i * evShift)).as("event_id"),
          $"ts", $"user_id", $"event_type", $"value", $"props")
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val li = spark.read.parquet(s"$base/lineitem.parquet")
      val ord = spark.read.parquet(s"$base/orders.parquet")
      // ONE shared shift for both sides so every replicated lineitem
      // still finds its order — the join selectivity is scale-invariant
      val okShift = math.max(
        li.agg(max($"l_orderkey")).head().getLong(0),
        ord.agg(max($"o_orderkey")).head().getLong(0)) + 1
      (0 until n).map { i =>
        li.withColumn("l_orderkey", $"l_orderkey" + lit(i * okShift))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      (0 until n).map { i =>
        ord.withColumn("o_orderkey", $"o_orderkey" + lit(i * okShift))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      // customer/supplier (privacy censuses, fuzzy join): keys shift
      // AND the entity name is re-rendered from the shifted key so the
      // name-derived 9-digit match key stays consistent — replicas are
      // new entities, the representative "bigger directory" shape
      val cust = spark.read.parquet(s"$base/customer.parquet")
      val cShift = cust.agg(max($"c_custkey")).head().getLong(0) + 1
      // lpad(_, 9, "0") TRUNCATES to the leftmost 9 chars once a shifted
      // key exceeds 9 digits, silently colliding distinct replicated
      // entities onto one fuzzy-join match key (ADVICE r9 #3). Guard the
      // rendered-key domain before synthesizing.
      require(n.toLong * cShift < 1000000000L,
        s"replication x$n would shift c_custkey past 9 digits " +
          s"(max ${n.toLong * cShift}); widen the rendered key first")
      (0 until n).map { i =>
        cust.withColumn("c_custkey", $"c_custkey" + lit(i * cShift))
          .withColumn("c_name",
            concat(lit("Customer#"), lpad($"c_custkey".cast("string"), 9, "0")))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      val sup = spark.read.parquet(s"$base/supplier.parquet")
      val sShift = sup.agg(max($"s_suppkey")).head().getLong(0) + 1
      require(n.toLong * sShift < 1000000000L,
        s"replication x$n would shift s_suppkey past 9 digits " +
          s"(max ${n.toLong * sShift}); widen the rendered key first")
      (0 until n).map { i =>
        sup.withColumn("s_suppkey", $"s_suppkey" + lit(i * sShift))
          .withColumn("s_name",
            concat(lit("Supplier#"), lpad($"s_suppkey".cast("string"), 9, "0")))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
      dir
    }

    val dirs = factors.map(n => n -> synth(n)).toMap
    val times = scala.collection.mutable.Map[(String, Int), Double]()
    for (n <- factors; op <- ops) {
      val fn = SparkEntry.all(op).fn
      // warm (materializes the per-dir memoized lineages — their build
      // is part of the per-corpus cost, so time it IN the reps below
      // would be wrong for the marginal-query story; the memo build is
      // itself linear by construction and reported separately at x1/xN
      // via the first-rep column)
      fn(spark, dirs(n)).write.format("noop").mode("overwrite").save()
      // MIN of 5: single-box scale-up runs hit stop-the-world GC pauses
      // from the synth tables' page-cache churn (observed: one rep of a
      // 0.5 s query reading 22 s); the minimum is the standard
      // contention-robust estimator for "what the operator costs"
      val reps = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dirs(n)).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      times((op, n)) = reps.min
      spark.catalog.clearCache()
    }
    val lo = factors.min
    val hi = factors.max
    println(f"[scaleprobe] ${"op"}%-16s " +
      factors.map(n => f"x$n%-7d").mkString(" ") + " alpha")
    ops.foreach { op =>
      val row = factors.map(n => f"${times((op, n))}%-7.2f").mkString(" ")
      val alpha = math.log(times((op, hi)) / times((op, lo))) /
        math.log(hi.toDouble / lo)
      println(f"[scaleprobe] $op%-16s $row ${alpha}%5.2f")
    }
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
    rm(root.toFile)
    spark.stop()
  }
}
