package graft

import java.nio.file.Files
import java.sql.Date
import org.apache.spark.sql.functions._
import graft.etl.Pipeline

/** The re-grounded reference pipeline (graft.etl.Pipeline): cold start,
  * watermark resume, delta-only processing, schema-enforced append —
  * energy_etl.py's semantics verified end-to-end on a temp sink. */
class PipelineSpec extends SparkSpec {

  private def events(rows: Seq[(String, String, Double)]) = {
    import spark.implicits._
    rows.toDF("ts", "zone", "value").withColumn("ts", to_timestamp($"ts"))
  }

  test("cold start loads full history; resume loads only the delta") {
    val sink = Files.createTempDirectory("graft_sink").toString + "/t"
    val day1 = events(Seq(
      ("2024-01-01 01:00:00", "SE1", 10.0), ("2024-01-01 02:00:00", "SE1", 20.0),
      ("2024-01-01 01:00:00", "SE2", 5.0)))
    val n1 = Pipeline.runIncremental(spark, day1, "zone", sink, Date.valueOf("2024-01-02"))
    assert(n1 === 2) // (01-01, SE1), (01-01, SE2)
    assert(Pipeline.watermark(spark, sink) === Some(Date.valueOf("2024-01-01")))

    // second run: one stale row (already-loaded day, must be skipped) + new day
    val day2 = events(Seq(
      ("2024-01-01 03:00:00", "SE1", 99.0), // ≤ watermark — skipped
      ("2024-01-02 01:00:00", "SE1", 30.0), ("2024-01-02 02:00:00", "SE1", 50.0)))
    val n2 = Pipeline.runIncremental(spark, day2, "zone", sink, Date.valueOf("2024-01-03"))
    assert(n2 === 1) // only (01-02, SE1)

    val all = spark.read.parquet(sink)
    assert(all.count() === 3)
    // the daily means match the reference's hourly→daily reduction
    val m = all.select(col("date").cast("string"), col("group_key"), col("avg_value"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("2024-01-01", "SE1")) === 15.0)
    assert(m(("2024-01-01", "SE2")) === 5.0)
    assert(m(("2024-01-02", "SE1")) === 40.0)
    // append-only: stale 99.0 never overwrote day 1
    assert(Pipeline.watermark(spark, sink) === Some(Date.valueOf("2024-01-02")))
  }

  test("partition-overwrite mode: replaying the same delta leaves the table identical") {
    val sink = Files.createTempDirectory("graft_once").toString + "/t"
    val day1 = events(Seq(
      ("2024-01-01 01:00:00", "SE1", 10.0), ("2024-01-01 02:00:00", "SE1", 20.0),
      ("2024-01-02 01:00:00", "SE2", 5.0)))
    def snapshot() = spark.read.parquet(sink)
      .select(col("date").cast("string"), col("group_key"), col("avg_value"),
        col("n"), col("load_date").cast("string"))
      .collect().map(_.toSeq).sortBy(_.toString)

    Pipeline.runIncremental(spark, day1, "zone", sink, Date.valueOf("2024-01-03"),
      overwritePartitions = true)
    val once = snapshot()
    assert(once.length === 2)
    // crash replay: the watermark has advanced, so the retry rolls it
    // back over the whole delta and overwrites the same date partitions
    Pipeline.runIncremental(spark, day1, "zone", sink, Date.valueOf("2024-01-03"),
      overwritePartitions = true, reprocessDays = 5)
    assert(snapshot() === once) // no duplicates, bit-identical rows
    // …whereas the reference's blind append would have doubled the rows
  }

  test("partition-overwrite replaces only the delta's own date partitions") {
    val sink = Files.createTempDirectory("graft_dyn").toString + "/t"
    Pipeline.runIncremental(spark,
      events(Seq(("2024-01-01 01:00:00", "SE1", 10.0))),
      "zone", sink, Date.valueOf("2024-01-02"), overwritePartitions = true)
    // late-corrected day-2 data arrives twice (retry with revision):
    // the day-2 partition is replaced, day 1 is untouched
    Pipeline.runIncremental(spark,
      events(Seq(("2024-01-02 01:00:00", "SE1", 30.0))),
      "zone", sink, Date.valueOf("2024-01-03"), overwritePartitions = true)
    Pipeline.runIncremental(spark,
      events(Seq(("2024-01-02 01:00:00", "SE1", 50.0))),
      "zone", sink, Date.valueOf("2024-01-04"), overwritePartitions = true,
      reprocessDays = 1)
    val m = spark.read.parquet(sink)
      .select(col("date").cast("string"), col("avg_value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.size === 2) // one row per day — the revision did not append
    assert(m("2024-01-01") === 10.0) // untouched partition
    assert(m("2024-01-02") === 50.0) // replaced with the revision
  }

  test("reprocessDays without overwritePartitions is rejected") {
    val sink = Files.createTempDirectory("graft_guard").toString + "/t"
    intercept[IllegalArgumentException] {
      Pipeline.runIncremental(spark,
        events(Seq(("2024-01-01 01:00:00", "SE1", 1.0))),
        "zone", sink, Date.valueOf("2024-01-02"), reprocessDays = 3)
    }
  }

  test("empty delta: observed load report returns 0 and touches nothing") {
    val sink = Files.createTempDirectory("graft_empty").toString + "/t"
    val n1 = Pipeline.runIncremental(spark,
      events(Seq(("2024-01-02 01:00:00", "SE1", 1.0))),
      "zone", sink, Date.valueOf("2024-01-03"))
    assert(n1 === 1)
    // all source rows at or below the watermark → nothing to load, and
    // the rows-loaded observation (collected during the write pass
    // itself — no post-write sink re-read) reports exactly 0
    val n2 = Pipeline.runIncremental(spark,
      events(Seq(("2024-01-01 01:00:00", "SE1", 99.0))),
      "zone", sink, Date.valueOf("2024-01-04"))
    assert(n2 === 0)
    assert(spark.read.parquet(sink).count() === 1)
  }

  test("sink enforces the declared schema") {
    val sink = Files.createTempDirectory("graft_sink2").toString + "/t"
    Pipeline.runIncremental(spark, events(Seq(("2024-01-01 01:00:00", "SE1", 1.0))),
      "zone", sink, Date.valueOf("2024-01-02"))
    val got = spark.read.parquet(sink).schema.fields
      .map(f => f.name -> f.dataType.typeName).toMap
    assert(got("group_key") === "string")
    assert(got("avg_value") === "double")
    assert(got("n") === "long")
    assert(got("date") === "date") // partition column survives round-trip
  }

  test("cold-start lookback caps history like the reference's 10-day bound") {
    val sink = Files.createTempDirectory("graft_lookback").toString + "/t"
    val history = events(Seq(
      ("2024-01-01 01:00:00", "SE1", 1.0), // beyond lookback — skipped
      ("2024-01-08 01:00:00", "SE1", 2.0),
      ("2024-01-10 01:00:00", "SE1", 3.0)))
    val n = Pipeline.runIncremental(spark, history, "zone", sink,
      Date.valueOf("2024-01-11"), coldStartLookbackDays = Some(3))
    assert(n === 2) // only days within max(date)-3
    val dates = spark.read.parquet(sink).select(col("date").cast("string"))
      .collect().map(_.getString(0)).sorted
    assert(dates.toSeq === Seq("2024-01-08", "2024-01-10"))
  }

  test("date-partitioned sink gives partition pruning to downstream readers") {
    import spark.implicits._
    val sink = Files.createTempDirectory("graft_prune").toString + "/t"
    val rows = events(Seq(
      ("2024-01-01 01:00:00", "SE1", 1.0), ("2024-01-02 01:00:00", "SE1", 2.0),
      ("2024-01-03 01:00:00", "SE1", 3.0)))
    Pipeline.runIncremental(spark, rows, "zone", sink, Date.valueOf("2024-01-04"))
    val read = spark.read.parquet(sink)
      .filter($"date" === lit("2024-01-02").cast("date"))
    val plan = read.queryExecution.executedPlan.toString
    // the filter must land in PartitionFilters (directory pruning), so a
    // daily job over a 100 TB sink reads one partition, not the table
    assert(plan.contains("PartitionFilters: [isnotnull(date"), plan)
    assert(read.count() === 1)
  }

  test("schema evolution: appended column surfaces via mergeSchema, old rows null") {
    import spark.implicits._
    val sink = Files.createTempDirectory("graft_evo").toString + "/t"
    Seq(("2024-01-01", "SE1", 1.0)).toDF("date", "zone", "v")
      .withColumn("date", to_date($"date"))
      .write.mode("append").parquet(sink)
    // v2 of the producer adds a column; append-only sink must tolerate it
    Seq(("2024-01-02", "SE1", 2.0, "api-v2")).toDF("date", "zone", "v", "src")
      .withColumn("date", to_date($"date"))
      .write.mode("append").parquet(sink)
    val merged = spark.read.option("mergeSchema", "true").parquet(sink)
    assert(merged.columns.toSet === Set("date", "zone", "v", "src"))
    val bySrc = merged.select($"v", $"src").collect()
      .map(r => r.getDouble(0) -> Option(r.getString(1))).toMap
    assert(bySrc(1.0) === None)          // old rows: new column is null
    assert(bySrc(2.0) === Some("api-v2"))
    // without mergeSchema the read keys off one footer — document that
    // readers of an evolving sink must opt in
    val plain = spark.read.parquet(sink)
    assert(plain.columns.length >= 3)
  }

  test("JSON payload ingest parses the reference's hourly-array shape") {
    import spark.implicits._
    val payload =
      """[{"ts":"2024-01-01T01:00:00Z","zone":"SE1","value":1.5},
        | {"ts":"2024-01-01T02:00:00Z","zone":"SE1","value":2.5}]""".stripMargin
    val parsed = Pipeline.fromJsonPayloads(Seq(payload).toDF("body"), "body")
    assert(parsed.count() === 2)
    assert(parsed.schema.fieldNames.toSeq === Seq("ts", "zone", "value"))
    assert(parsed.agg(sum($"value")).as[Double].head() === 4.0)
  }

  test("upsert: changed keys update, untouched keys survive, replay idempotent") {
    import spark.implicits._
    val sink = Files.createTempDirectory("graft_upsert").toString + "/t"
    def mk(rows: Seq[(String, String, Double, Long, String)]) =
      rows.toDF("date", "group_key", "avg_value", "n", "load_date")
        .select(col("date").cast("date"), col("group_key"),
          col("avg_value"), col("n"), col("load_date").cast("date"))
    val seed = mk(Seq(
      ("2024-01-01", "SE1", 10.0, 2L, "2024-01-02"),
      ("2024-01-01", "SE2", 5.0, 1L, "2024-01-02"),
      ("2024-01-02", "SE1", 40.0, 2L, "2024-01-03")))
    assert(Pipeline.upsert(spark, seed, sink) === 3)
    // correction batch: SE1@01-01 CHANGES, SE3@01-01 is new,
    // 01-02 is not in the batch at all
    val fix = mk(Seq(
      ("2024-01-01", "SE1", 11.5, 3L, "2024-01-05"),
      ("2024-01-01", "SE3", 7.0, 1L, "2024-01-05")))
    Pipeline.upsert(spark, fix, sink)
    def snap() = spark.read.parquet(sink)
      .select(col("date").cast("string"), col("group_key"),
        col("avg_value"), col("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap
    val s1 = snap()
    assert(s1.size === 4, "no duplicate keys after merge")
    assert(s1(("2024-01-01", "SE1")) === ((11.5, 3L)), "changed key updated")
    assert(s1(("2024-01-01", "SE2")) === ((5.0, 1L)),
      "untouched key inside the rewritten partition survives")
    assert(s1(("2024-01-02", "SE1")) === ((40.0, 2L)), "untouched partition intact")
    assert(s1(("2024-01-01", "SE3")) === ((7.0, 1L)), "new key inserted")
    // crash-replay of the same batch changes nothing
    Pipeline.upsert(spark, fix, sink)
    assert(snap() === s1)
    // mechanical contracts: partition cap, key must cover the partition col
    intercept[IllegalArgumentException] {
      Pipeline.upsert(spark, seed, sink, maxPartitions = 1)
    }
    intercept[IllegalArgumentException] {
      Pipeline.upsert(spark, seed, sink, keyCols = Seq("group_key"))
    }
  }

  test("upsert property: random batch sequence == driver-side map fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val sink = Files.createTempDirectory("graft_upsert_prop").toString + "/t"
    val dates = (1 to 6).map(d => f"2024-02-$d%02d")
    val groups = Seq("SE1", "SE2", "SE3")
    // reference semantics: last write per (date, group) wins
    val ref = scala.collection.mutable.Map[(String, String), (Double, Long)]()
    (1 to 5).foreach { batch =>
      val rows = (1 to (3 + rnd.nextInt(6))).map { _ =>
        val k = (dates(rnd.nextInt(dates.length)), groups(rnd.nextInt(groups.length)))
        k -> ((rnd.nextInt(1000).toDouble / 10, rnd.nextInt(100).toLong))
      }.toMap // unique keys within a batch (upsert's caller contract)
      rows.foreach { case (k, v) => ref(k) = v }
      val df = rows.toSeq.map { case ((d, g), (v, n)) => (d, g, v, n, "2024-03-01") }
        .toDF("date", "group_key", "avg_value", "n", "load_date")
        .select(col("date").cast("date"), col("group_key"),
          col("avg_value"), col("n"), col("load_date").cast("date"))
      Pipeline.upsert(spark, df, sink)
    }
    val got = spark.read.parquet(sink)
      .select(col("date").cast("string"), col("group_key"),
        col("avg_value"), col("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap
    assert(got === ref.toMap)
  }

  test("clusteredWrite yields disjoint per-file key ranges (file-skipping layout)") {
    val dir = Files.createTempDirectory("graft_clustered").toString + "/t"
    val docs = graft.util.Tables.documents(spark, sf)
    Pipeline.clusteredWrite(docs, "doc_id", numFiles = 4, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length === 4, files.mkString(","))
    // each file's footer min/max must be pairwise disjoint — that
    // disjointness IS the prunability: a doc_id range predicate reads
    // one file, not all of them
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("doc_id")), max(col("doc_id"))).first()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, s"overlap: $hi >= $lo")
      case _ => ()
    }
    // nothing lost in the re-layout, and a point-range read still matches
    val clustered = spark.read.parquet(dir)
    assert(clustered.count() === docs.count())
    assert(clustered.filter(col("doc_id").between(10, 20)).count() ===
      docs.filter(col("doc_id").between(10, 20)).count())
  }

  test("versioned snapshots: time travel reads old versions, _latest " +
    "tracks the last COMMITTED one, vacuum keeps the newest") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_versioned").toString + "/t"
    val v1 = Pipeline.writeVersioned(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), dir)
    val v2 = Pipeline.writeVersioned(spark, Seq((1, "a2"), (3, "c")).toDF("k", "v"), dir)
    assert(v1 === 1 && v2 === 2)
    assert(Pipeline.versions(dir) === Seq(1, 2))
    // default read = latest; explicit version = time travel
    assert(Pipeline.readVersion(spark, dir).orderBy("k")
      .as[(Int, String)].collect().toSeq === Seq((1, "a2"), (3, "c")))
    assert(Pipeline.readVersion(spark, dir, Some(1)).orderBy("k")
      .as[(Int, String)].collect().toSeq === Seq((1, "a"), (2, "b")))
    // a crashed writer: data directory exists but pointer never swapped
    Seq((9, "orphan")).toDF("k", "v").write.parquet(s"$dir/v=3")
    assert(Pipeline.readVersion(spark, dir).count() === 2) // still v2
    // vacuum retires old versions but never the committed latest
    val dropped = Pipeline.vacuumVersions(dir, keep = 1)
    assert(dropped === Seq(1))
    assert(!new java.io.File(s"$dir/v=1").exists())
    assert(Pipeline.readVersion(spark, dir).count() === 2)
    // an unversioned dir (no _latest pointer) is refused with a clear
    // message instead of a raw NoSuchFileException from deep inside
    val plain = Files.createTempDirectory("graft_unversioned").toString
    val e = intercept[IllegalArgumentException] {
      Pipeline.vacuumVersions(plain)
    }
    assert(e.getMessage.contains("_latest missing"))
  }

  test("readEvolved: old files read NULL for added columns; removal, " +
    "retyping, and undeclared columns are refused") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    // era 1: (k, v)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.mode("append").parquet(dir)
    // era 2: schema gained `score`
    Seq((3L, "c", 0.5)).toDF("k", "v", "score")
      .write.mode("append").parquet(dir)
    val declared = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("score", DoubleType),
      // declared but not yet written by ANY file
      StructField("flags", LongType)))
    val got = Pipeline.readEvolved(spark, dir, declared)
    assert(got.columns.toSeq === Seq("k", "v", "score", "flags"))
    val rows = got.orderBy("k")
      .as[(Long, String, Option[Double], Option[Long])].collect().toSeq
    assert(rows === Seq(
      (1L, "a", None, None), (2L, "b", None, None),
      (3L, "c", Some(0.5), None)))
    // declared schema missing an on-disk column → refused
    val e1 = intercept[IllegalArgumentException] {
      Pipeline.readEvolved(spark, dir, StructType(declared.fields.take(2)))
    }
    assert(e1.getMessage.contains("undeclared column"))
    // retyping a column → refused
    val retyped = StructType(declared.fields.map(f =>
      if (f.name == "score") f.copy(dataType = StringType) else f))
    val e2 = intercept[IllegalArgumentException] {
      Pipeline.readEvolved(spark, dir, retyped)
    }
    assert(e2.getMessage.contains("retyping"))
  }

  test("compact rewrites to the planned file count without changing content") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    // 8 small files of 25 rows each
    (0 until 8).foreach { i =>
      (i * 25 until (i + 1) * 25).map(k => (k.toLong, s"r$k"))
        .toDF("k", "v").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val before = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before === 8)
    val expected = spark.read.parquet(dir).orderBy("k")
      .as[(Long, String)].collect().toSeq
    val files = Pipeline.compact(spark, dir, targetRowsPerFile = 100)
    assert(files === 2)
    val after = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after === 2, s"expected 2 files after compaction, got $after")
    assert(spark.read.parquet(dir).orderBy("k")
      .as[(Long, String)].collect().toSeq === expected)
    assert(!new java.io.File(dir.stripSuffix("/") + ".compact_staging").exists())
    assert(!new java.io.File(dir.stripSuffix("/") + ".compact_old").exists())
  }

  test("compact recovers every crash point of the rename-swap commit") {
    import spark.implicits._
    import java.nio.file.{Files => NF, Paths, StandardCopyOption}
    def mkTable(): String = {
      val dir = Files.createTempDirectory("graft_compact_crash").toString + "/t"
      (0 until 4).foreach { i =>
        (i * 25 until (i + 1) * 25).map(k => (k.toLong, s"r$k"))
          .toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
      }
      dir
    }
    def rows(dir: String): Seq[(Long, String)] =
      spark.read.parquet(dir).orderBy("k").as[(Long, String)].collect().toSeq

    // crash BEFORE the swap: a partial staging dir is left beside the
    // live table → next run drops it and completes
    val d1 = mkTable(); val exp1 = rows(d1)
    val stg = d1 + ".compact_staging"
    new java.io.File(stg).mkdirs()
    NF.writeString(Paths.get(stg, "part-corrupt.parquet"), "not parquet")
    assert(Pipeline.compact(spark, d1, targetRowsPerFile = 100) === 1)
    assert(rows(d1) === exp1)
    assert(!new java.io.File(stg).exists())

    // crash BETWEEN the two renames: live dir is missing, the complete
    // old layout sits at .compact_old → next run rolls it back first
    val d2 = mkTable(); val exp2 = rows(d2)
    NF.move(Paths.get(d2), Paths.get(d2 + ".compact_old"),
      StandardCopyOption.ATOMIC_MOVE)
    assert(!new java.io.File(d2).exists())
    assert(Pipeline.compact(spark, d2, targetRowsPerFile = 100) === 1)
    assert(rows(d2) === exp2)
    assert(!new java.io.File(d2 + ".compact_old").exists())

    // crash AFTER the publish rename but before cleanup: a retired old
    // layout sits beside the (already-new) live dir → dropped on entry
    val d3 = mkTable(); val exp3 = rows(d3)
    new java.io.File(d3 + ".compact_old").mkdirs()
    Seq((999L, "stale")).toDF("k", "v")
      .write.mode("overwrite").parquet(d3 + ".compact_old")
    assert(Pipeline.compact(spark, d3, targetRowsPerFile = 100) === 1)
    assert(rows(d3) === exp3)
    assert(!new java.io.File(d3 + ".compact_old").exists())
  }

  test("deleteKeys: copy-on-write of matching partitions only, emptied " +
    "partitions removed, idempotent replay") {
    import spark.implicits._
    val sink = Files.createTempDirectory("graft_del").toString + "/t"
    val day1 = events(Seq(
      ("2024-01-01 01:00:00", "SE1", 10.0), ("2024-01-01 02:00:00", "SE2", 20.0),
      ("2024-01-02 01:00:00", "SE1", 30.0), ("2024-01-02 02:00:00", "SE3", 40.0),
      ("2024-01-03 01:00:00", "SE9", 70.0)))
    Pipeline.runIncremental(spark, day1, "zone", sink, Date.valueOf("2024-01-04"))
    def state() = spark.read.parquet(sink)
      .select(col("date").cast("string"), col("group_key"))
      .as[(String, String)].collect().toSet
    assert(state().size === 5)
    val untouchedFiles = new java.io.File(s"$sink/date=2024-01-03")
      .listFiles().map(_.getName).toSet

    // the GDPR request: forget SE1 everywhere
    val n = Pipeline.deleteKeys(spark, Seq("SE1").toDF("group_key"), sink)
    assert(n === 2)
    assert(state() === Set(("2024-01-01", "SE2"), ("2024-01-02", "SE3"),
      ("2024-01-03", "SE9")))
    // the partition with no matches was never rewritten
    assert(new java.io.File(s"$sink/date=2024-01-03")
      .listFiles().map(_.getName).toSet === untouchedFiles)

    // replay is a no-op
    assert(Pipeline.deleteKeys(spark, Seq("SE1").toDF("group_key"), sink) === 0L)
    assert(state().size === 3)

    // the dynamic-overwrite pitfall: deleting a partition's LAST rows
    // must remove the partition directory, not silently keep old files
    assert(Pipeline.deleteKeys(spark, Seq("SE9").toDF("group_key"), sink) === 1L)
    assert(!new java.io.File(s"$sink/date=2024-01-03").exists())
    assert(state() === Set(("2024-01-01", "SE2"), ("2024-01-02", "SE3")))
  }

  test("deleteKeys: crash between commit and dir removal — re-run IS the " +
    "recovery path; post-condition blocks a false success") {
    import spark.implicits._
    val sink = Files.createTempDirectory("graft_del_crash").toString + "/t"
    val day1 = events(Seq(
      ("2024-01-01 01:00:00", "SE1", 10.0), ("2024-01-02 01:00:00", "SE2", 20.0),
      ("2024-01-03 01:00:00", "SE1", 30.0)))
    Pipeline.runIncremental(spark, day1, "zone", sink, Date.valueOf("2024-01-04"))
    // snapshot the files of a partition the delete will EMPTY, so we can
    // resurrect them — exactly the state a crash between the dynamic-
    // overwrite commit and the directory rm leaves behind
    val doomed = new java.io.File(s"$sink/date=2024-01-03")
    val stash = Files.createTempDirectory("graft_del_stash").toFile
    doomed.listFiles().filter(_.isFile).foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(stash, f.getName).toPath): Unit
    }
    assert(Pipeline.deleteKeys(spark, Seq("SE1").toDF("group_key"), sink) === 2L)
    assert(!doomed.exists())
    // simulate the crash aftermath: the emptied partition's old files
    // are back on disk (commit landed, rm never ran)
    doomed.mkdirs()
    stash.listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(doomed, f.getName).toPath): Unit
    }
    val resurrected = spark.read.parquet(sink)
      .filter(col("group_key") === "SE1").count()
    assert(resurrected === 1L) // the damage is real
    // recovery = re-run the same request (idempotent): the resurrected
    // rows match again, the partition re-lists, the rm completes, and
    // the post-condition passes
    assert(Pipeline.deleteKeys(spark, Seq("SE1").toDF("group_key"), sink) === 1L)
    assert(!doomed.exists())
    assert(spark.read.parquet(sink)
      .filter(col("group_key") === "SE1").count() === 0L)
  }

  test("deleteKeys: URL-escaped and NULL partition values resolve to the " +
    "real on-disk directories; null partition's kept rows survive") {
    import spark.implicits._
    val sink = Files.createTempDirectory("graft_del_esc").toString + "/t"
    // partition values Spark escapes on disk (space, ':', '%') plus NULL
    // (__HIVE_DEFAULT_PARTITION__); k1 empties 'x:y'; both keys share the
    // null partition so it must be REWRITTEN (k2 kept), not rm'd
    Seq(("k1", Some("a b")), ("k1", Some("x:y")), ("k1", None),
      ("k2", Some("a b")), ("k2", Some("p%q")), ("k2", None))
      .toDF("group_key", "src")
      .write.partitionBy("src").parquet(sink)
    val n = Pipeline.deleteKeys(spark, Seq("k1").toDF("group_key"), sink,
      keyCols = Seq("group_key"), partitionCol = "src")
    assert(n === 3)
    val remaining = spark.read.parquet(sink)
      .select(col("group_key"), coalesce(col("src"), lit("<null>")))
      .as[(String, String)].collect().toSet
    assert(remaining === Set(
      ("k2", "a b"), ("k2", "p%q"), ("k2", "<null>")))
    // the emptied escaped partition dir is gone; survivors keep theirs
    val dirs = new java.io.File(sink).listFiles()
      .filter(_.isDirectory).map(_.getName).filterNot(_.startsWith(".")).toSet
    assert(!dirs.exists(_.contains("x%3Ay")), s"emptied dir survived: $dirs")
    assert(dirs.contains("src=a b") && dirs.contains("src=p%25q") &&
      dirs.contains("src=__HIVE_DEFAULT_PARTITION__"), dirs.toString)

    // now empty the null partition entirely — its directory must go
    assert(Pipeline.deleteKeys(spark, Seq("k2").toDF("group_key"), sink,
      keyCols = Seq("group_key"), partitionCol = "src") === 3L)
    assert(!new java.io.File(s"$sink/src=__HIVE_DEFAULT_PARTITION__").exists())
  }
}
