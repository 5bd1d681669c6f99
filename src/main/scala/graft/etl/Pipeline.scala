package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference pipeline re-grounded on Spark (SURVEY.md §3, §7.1):
  * watermark → bounded delta → per-(day, group) mean → schema-enforced
  * append. This is `/root/reference/scripts/energy_etl.py` (:22-37 watermark,
  * :39-84 fetch+reduce, :86-108 load) re-expressed as a declarative batch
  * over a date-partitioned Parquet sink.
  *
  * Scale design (100 TB):
  *  - the sink is PARTITIONED BY load date → the watermark read is a
  *    partition-listing max, not a table scan, and downstream readers get
  *    static partition pruning;
  *  - the delta filter lands on the source scan (predicate pushdown), so a
  *    daily run reads only new row groups;
  *  - the hourly→daily reduction is a partial-agg hash aggregate: the
  *    shuffle carries |days × groups| partial states, a ~24× cut before any
  *    exchange (mirrors the reference's in-process mean, energy_etl.py:69);
  *  - the write side has two modes: blind append (the reference's
  *    WRITE_APPEND, :105 — at-least-once, duplicates on crash replay,
  *    [[readDeduped]] recovers on read) and date-keyed DYNAMIC PARTITION
  *    OVERWRITE (`overwritePartitions = true`) — replaying a delta
  *    rewrites exactly its own date partitions with identical content,
  *    so retries are idempotent WRITE-side, closing the reference's one
  *    semantic hole. A `reprocessDays` overlap window rolls the
  *    watermark back n days each run, making partial-write damage
  *    self-healing (the standard reprocessing-window idiom).
  */
object Pipeline {

  /** Sink schema — the reference's BigQuery schema (energy_etl.py:92-97)
    * re-typed for Spark. */
  val sinkSchema: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("group_key", StringType, nullable = false),
    StructField("avg_value", DoubleType, nullable = true),
    StructField("n", LongType, nullable = false),
    StructField("load_date", DateType, nullable = false)))

  /** MAX(date) already loaded, or None on cold start (energy_etl.py:41-46).
    * Reads only the sink's partition column — on a date-partitioned sink
    * this resolves from directory listing + footer stats, no data scan. */
  def watermark(spark: SparkSession, sinkDir: String): Option[java.sql.Date] = {
    val dir = new java.io.File(sinkDir)
    if (!dir.exists() || dir.listFiles() == null || dir.listFiles().isEmpty) None
    else
      Option(spark.read.parquet(sinkDir).agg(max(col("date"))).first().getDate(0))
  }

  /** One incremental run: reduce source rows with date > watermark to one
    * (date, group) mean row each and append them to the sink. Returns the
    * number of appended rows (the reference's load report, :109).
    *
    * @param events    source with (ts timestamp, group col, value double)
    * @param groupCol  the per-group key column name (reference's zone)
    * @param loadDate  injected deterministic "now" (reference's utcnow :100)
    * @param overwritePartitions  true → date-keyed dynamic partition
    *                  overwrite (idempotent replay); false → the
    *                  reference's blind append
    * @param reprocessDays  roll the watermark back n days so each run
    *                  recomputes-and-overwrites a trailing window —
    *                  self-healing against partial writes; only sound
    *                  with `overwritePartitions` (asserted)
    */
  def runIncremental(
      spark: SparkSession,
      events: DataFrame,
      groupCol: String,
      sinkDir: String,
      loadDate: java.sql.Date,
      coldStartLookbackDays: Option[Int] = None,
      overwritePartitions: Boolean = false,
      reprocessDays: Int = 0): Long = {
    require(reprocessDays == 0 || overwritePartitions,
      "reprocessDays without overwritePartitions would append duplicate days")
    val wm = watermark(spark, sinkDir)
      .map(d => if (reprocessDays == 0) d
        else java.sql.Date.valueOf(d.toLocalDate.minusDays(reprocessDays.toLong)))
    val delta = wm match {
      case Some(d) => events.filter(to_date(col("ts")) > lit(d))
      case None => coldStartLookbackDays match {
        // the reference's bounded cold start (energy_etl.py:44-46): only
        // the trailing n days of source history. The bound is relative to
        // the source's own max date (a broadcast scalar, no collect).
        case Some(n) =>
          val maxD = events.agg(max(to_date(col("ts"))).as("hi"))
          events.crossJoin(broadcast(maxD))
            .filter(to_date(col("ts")) > date_sub(col("hi"), n))
            .drop("hi")
        case None => events // unbounded cold start: full history
      }
    }
    val daily = delta
      .groupBy(to_date(col("ts")).as("date"), col(groupCol).as("group_key"))
      .agg(
        (sum(col("value").cast("decimal(28,10)")).cast("double") /
          count(lit(1))).as("avg_value"),
        count(lit(1)).as("n"))
      .withColumn("load_date", lit(loadDate))
      // schema enforcement (:92-97): project + cast to the declared sink
      // types — stays inside codegen, unlike a round-trip through RDD
      .select(sinkSchema.fields.map(f => col(f.name).cast(f.dataType).as(f.name))
        .toIndexedSeq: _*)

    // The load report rides the write itself (df.observe): executors
    // collect the named metrics AS the write runs, so counting the
    // appended rows costs ZERO extra scans — the pre-r8 implementation
    // re-read the sink after the write to count, a full extra read of
    // the loaded partition per run. The same observation carries the
    // load's date span and source-event coverage for operational
    // logging, all from the single pass.
    val obs = org.apache.spark.sql.Observation()
    // cluster the write by its partition column (guide §6 small-files
    // rule): without it every shuffle partition holding rows of a date
    // opens its own file there — the sink grew ~(partitions × dates)
    // tiny files per load and every downstream read/listing (the CoW
    // upsert re-reads the sink each call) paid for them. One writer
    // task per date ⇒ one file per date; at production volume the same
    // repartition bounds files at |dates| × ⌈rows/maxRecordsPerFile⌉.
    val audited = daily.repartition(col("date")).observe(obs,
      count(lit(1)).as("rows_loaded"),
      coalesce(sum(col("n")), lit(0L)).as("events_covered"),
      min(col("date")).as("first_date"),
      max(col("date")).as("last_date"))

    if (overwritePartitions) {
      // dynamic mode replaces ONLY the partitions present in `daily`
      // (an empty delta touches nothing); static overwrite would drop
      // the whole sink
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.get(key, "static")
      spark.conf.set(key, "dynamic")
      try audited.write
        .partitionBy("date")
        .mode(SaveMode.Overwrite)
        .parquet(sinkDir)
      finally spark.conf.set(key, prev)
    } else
      audited.write
        .partitionBy("date")
        .mode(SaveMode.Append)
        .parquet(sinkDir)
    obs.get("rows_loaded").asInstanceOf[Long]
  }

  /** Key-level MERGE (upsert) into the date-partitioned sink — the one
    * warehouse primitive the append/overwrite modes don't cover: a
    * replay or correction carrying CHANGED values for a subset of keys
    * inside a partition. Date-keyed dynamic partition overwrite
    * ([[runIncremental]] `overwritePartitions`) rewrites whole date
    * partitions FROM THE DELTA, so keys absent from the delta would be
    * dropped; blind append duplicates them. This is copy-on-write merge
    * (the Delta/Hudi CoW shape, public design): rewrite only the
    * affected date partitions, preserving their untouched keys.
    *
    * Mechanics:
    *  1. the affected-date list is a distinct-collect of the updates'
    *     partition key — watermark-class driver state (days, not rows),
    *     enforced by `maxPartitions`;
    *  2. existing rows of ONLY those dates are read (the isin literal
    *     list static-prunes the partitioned scan), updates' keys are
    *     anti-joined away, and the union with the updates is staged to
    *     a dot-dir Spark's file listing ignores — writing the merge
    *     result BEFORE touching the sink sidesteps the
    *     read-overwrite-same-path hazard and makes a mid-write crash
    *     harmless (the sink is untouched until stage 3);
    *  3. the staged rows dynamic-partition-overwrite exactly the
    *     affected dates. Replaying the same upsert regenerates the same
    *     staging content, so retries are idempotent end-to-end.
    *
    * At 100 TB both the read and the rewrite touch |affected dates| ×
    * |groups/day| daily rows — never the full sink; the double write of
    * the merged partitions is the standard CoW merge cost.
    *
    * Single-writer contract (the same one every path-based CoW merge
    * has): concurrent upserts to ONE sink share the staging dir and can
    * interleave partition replacement — serialize writers per sink (a
    * scheduler lock or a Delta/Iceberg-style transactional commit layer
    * at production scale).
    *
    * Returns the number of rows written into the affected partitions. */
  def upsert(
      spark: SparkSession,
      updates: DataFrame,
      sinkDir: String,
      keyCols: Seq[String] = Seq("date", "group_key"),
      partitionCol: String = "date",
      maxPartitions: Int = 10000): Long = {
    require(keyCols.contains(partitionCol),
      s"upsert key $keyCols must include the partition column $partitionCol" +
        " — a key that moves across partitions needs a full-sink merge")
    val dir = new java.io.File(sinkDir)
    val sinkEmpty =
      !dir.exists() || dir.listFiles() == null ||
        !dir.listFiles().exists(f => !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    if (sinkEmpty) {
      // observe rides the write: counting the loaded rows costs zero
      // extra jobs (the runIncremental load-report discipline)
      val obs0 = org.apache.spark.sql.Observation()
      updates.repartition(col(partitionCol)) // one file per partition value
        .observe(obs0, count(lit(1)).as("n"))
        .write.partitionBy(partitionCol).mode(SaveMode.Append).parquet(sinkDir)
      return obs0.get("n").asInstanceOf[Long]
    }
    // `updates` feeds three plan legs (affected-date collect, the
    // anti-join's key projection, the merge union): persist so the
    // caller's lineage — in the streaming sink, a window over the
    // micro-batch — computes once per upsert, not three times
    // (r13: pipeline_s_upsert paid the latestPerKey window 3× per
    // micro-batch). Unpersisted before return; delta-sized, never
    // sink-sized.
    updates.persist()
    try {
      val affected = updates.select(col(partitionCol)).distinct()
        .limit(maxPartitions + 1).collect().map(_.get(0))
      require(affected.length <= maxPartitions,
        s"upsert touches >$maxPartitions $partitionCol partitions — " +
          "that is a table rewrite, not an incremental merge; split the batch")
      if (affected.isEmpty) return 0L
      val existing = spark.read.parquet(sinkDir)
        .filter(col(partitionCol).isin(affected.toIndexedSeq: _*))
      val keep = existing.join(
        updates.select(keyCols.map(col): _*), keyCols.toIndexedSeq, "left_anti")
      val merged = keep.unionByName(updates)
      val staging = s"$sinkDir/.merge_staging"
      merged.write.mode(SaveMode.Overwrite).parquet(staging)
      val staged = spark.read.parquet(staging)
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.get(key, "static")
      spark.conf.set(key, "dynamic")
      // the row count rides the overwrite itself — the pre-r13 shape
      // re-read the staged parquet a second time just to count it —
      // and the write clusters by the partition column (one file per
      // replaced partition, the runIncremental small-files rule)
      val obs = org.apache.spark.sql.Observation()
      try staged.repartition(col(partitionCol))
        .observe(obs, count(lit(1)).as("n"))
        .write
        .partitionBy(partitionCol)
        .mode(SaveMode.Overwrite)
        .parquet(sinkDir)
      finally spark.conf.set(key, prev)
      val n = obs.get("n").asInstanceOf[Long]
    // staging is transient; a leftover from a crash is overwritten by
    // the next run, deletion is just hygiene
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
      rm(new java.io.File(staging))
      n
    } finally updates.unpersist(): Unit
  }

  /** Row-level keyed DELETE (the GDPR / right-to-be-forgotten verb —
    * the one write primitive [[upsert]] doesn't express, since an
    * upsert needs a replacement row): removes every sink row whose
    * `keyCols` match a row of `keys`, rewriting ONLY the partitions
    * that contain matches (copy-on-write via the same staging +
    * dynamic-partition-overwrite commit as [[upsert]]); untouched
    * partitions keep their files as-is. The affected-partition set
    * comes from the SINK side — a deletion request typically knows the
    * key, not which partitions hold it. Partitions left EMPTY by the
    * delete are removed explicitly after the commit: dynamic partition
    * overwrite only replaces partitions present in the staged frame, so
    * an all-rows-deleted partition would otherwise silently keep its
    * old files — the classic dynamic-overwrite delete pitfall, pinned
    * in PipelineSpec. Idempotent: re-applying the same delete finds no
    * matches and is a no-op. Returns the number of rows deleted.
    *
    * Crash window (documented, recovery = re-run): the dynamic-overwrite
    * commit lands first and the emptied-partition directory removal
    * after, so a crash between the two resurrects fully-deleted
    * partitions' old files. Because the delete is idempotent, re-running
    * the same request IS the recovery path — the resurrected rows match
    * the keys again, the partition re-lists as affected, and the rm
    * completes. A post-condition anti-join (count of surviving matches
    * === 0) runs before returning, so a partial apply can never report
    * success. Partition directory names are built with Spark's own
    * escaping (ExternalCatalogUtils), so values with spaces/':'/'%' and
    * NULL partition values (__HIVE_DEFAULT_PARTITION__) resolve to the
    * real on-disk directories. */
  def deleteKeys(
      spark: SparkSession,
      keys: DataFrame,
      sinkDir: String,
      keyCols: Seq[String] = Seq("group_key"),
      partitionCol: String = "date",
      maxPartitions: Int = 10000): Long = {
    val sink = spark.read.parquet(sinkDir)
    val keyFrame = keys.select(keyCols.map(col): _*).distinct()
    val hit = sink.join(keyFrame, keyCols.toIndexedSeq, "left_semi")
    val affected = hit.select(col(partitionCol)).distinct()
      .limit(maxPartitions + 1).collect().map(_.get(0))
    require(affected.length <= maxPartitions,
      s"delete touches >$maxPartitions $partitionCol partitions — " +
        "that is a table rewrite; split the request")
    if (affected.isEmpty) return 0L
    // NULL partition values never match isin (SQL three-valued logic) —
    // without the explicit isNull arm, a null partition's KEPT rows would
    // be dropped from staging while its directory is removed: data loss,
    // not just a missed delete. Pinned in PipelineSpec.
    val nonNull = affected.filter(_ != null)
    val inNonNull =
      if (nonNull.isEmpty) lit(false)
      else col(partitionCol).isin(nonNull.toIndexedSeq: _*)
    val partFilter =
      if (affected.contains(null)) inNonNull || col(partitionCol).isNull
      else inNonNull
    val existing = sink.filter(partFilter)
    // both counts ride the staging write as observations (the
    // runIncremental load-report discipline): `before` observes rows
    // ENTERING the anti-join, `after` rows surviving it — the pre-r13
    // shape paid a separate existing.count() scan, a staged.isEmpty
    // probe and a staged.count() re-read (3 extra jobs per call; the
    // bench delete entry calls this twice)
    val obsB = org.apache.spark.sql.Observation()
    val obsA = org.apache.spark.sql.Observation()
    val keep = existing.observe(obsB, count(lit(1)).as("n"))
      .join(keyFrame, keyCols.toIndexedSeq, "left_anti")
      .observe(obsA, count(lit(1)).as("n"))
    val staging = s"$sinkDir/.delete_staging"
    keep.write.mode(SaveMode.Overwrite).parquet(staging)
    val before = obsB.get("n").asInstanceOf[Long]
    val after = obsA.get("n").asInstanceOf[Long]
    val staged = spark.read.parquet(staging)
    val confKey = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(confKey, "static")
    spark.conf.set(confKey, "dynamic")
    try {
      if (after > 0L)
        staged.repartition(col(partitionCol)) // one file per kept partition
          .write.partitionBy(partitionCol)
          .mode(SaveMode.Overwrite).parquet(sinkDir)
    } finally spark.conf.set(confKey, prev)
    // partitions the delete emptied never appear in the staged frame —
    // dynamic overwrite leaves their files behind; drop them explicitly
    val survivors = staged.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSet
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
    affected.filterNot(survivors.contains).foreach { p =>
      // Spark URL-escapes partition values in directory names (spaces,
      // ':', '%', …) and writes NULL as __HIVE_DEFAULT_PARTITION__ — a
      // raw s"$col=$p" path misses those dirs and silently leaves
      // "deleted" rows on disk. getPartitionPathString applies the same
      // escaping the writer used (null/empty → the default partition).
      val dirName = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .getPartitionPathString(partitionCol, if (p == null) null else p.toString)
      rm(new java.io.File(s"$sinkDir/$dirName"))
    }
    val deleted = before - after
    rm(new java.io.File(staging))
    // post-condition — GDPR verb, verify don't trust: no surviving sink
    // row may match a requested key. A fully-emptied sink has no parquet
    // footers to read; that trivially satisfies the condition.
    val residual =
      try spark.read.parquet(sinkDir)
        .join(keyFrame, keyCols.toIndexedSeq, "left_semi").count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    require(residual == 0L,
      s"deleteKeys post-condition failed: $residual matching rows remain " +
        s"in $sinkDir — re-run the delete (idempotent recovery)")
    deleted
  }

  /** Idempotent-consumer read over the append-only sink: the reference's
    * WRITE_APPEND can duplicate a (date, group) on re-run after a partial
    * failure (energy_etl.py:103-107 — no merge); readers recover
    * exactly-once semantics by keeping only the LATEST load per key.
    * This is the standard at-least-once-writer / dedup-on-read pattern;
    * at 100 TB the window shuffles only the sink (already daily rows,
    * not raw events). */
  def readDeduped(spark: SparkSession, sinkDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("date"), col("group_key"))
      .orderBy(col("load_date").desc)
    spark.read.parquet(sinkDir)
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Schema-evolution-tolerant read of an append-only sink — the
    * contract a long-lived 100 TB table needs so adding a column never
    * requires rewriting old partitions: files written before the
    * addition simply lack it (their rows read as NULL), while removing
    * or retyping a declared column is REFUSED with a clear message
    * (that is a rewrite, not a read). Mechanics: parquet mergeSchema
    * union across file footers, validated against the caller's
    * declared schema (undeclared on-disk columns are an error too —
    * schema changes are explicit, never implied), then a projection to
    * the declared column order with typed NULLs for columns no file
    * carries yet. */
  def readEvolved(spark: SparkSession, dir: String,
      declared: StructType): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    val onDisk = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val declaredNames = declared.fieldNames.toSet
    val extras = df.schema.fieldNames.filterNot(declaredNames)
    require(extras.isEmpty,
      s"$dir carries undeclared column(s) ${extras.mkString(", ")} — " +
        "extend the declared schema; columns are added explicitly, " +
        "never implied from files")
    declared.fields.foreach { f =>
      onDisk.get(f.name).foreach { dt =>
        require(dt == f.dataType,
          s"column ${f.name} is ${dt.simpleString} on disk but declared " +
            s"${f.dataType.simpleString} — retyping requires a table " +
            "rewrite, not a read")
      }
    }
    df.select(declared.fields.map { f =>
      if (onDisk.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** The reference's raw ingest shape (energy_etl.py:64-69): each payload is
    * a JSON array of hourly records carrying a price field. Parse with an
    * explicit schema (no runtime inference), explode, and hand back typed
    * rows ready for [[runIncremental]]'s reduction. */
  val hourlySchema: ArrayType = ArrayType(StructType(Seq(
    StructField("ts", TimestampType),
    StructField("zone", StringType),
    StructField("value", DoubleType))))

  def fromJsonPayloads(payloads: DataFrame, jsonCol: String): DataFrame =
    payloads
      .select(explode(from_json(col(jsonCol), hourlySchema)).as("rec"))
      .select(col("rec.ts").as("ts"), col("rec.zone").as("zone"),
        col("rec.value").as("value"))

  /** Range-clustered table publish — the layout step that makes a big
    * Parquet table PRUNABLE. `repartitionByRange` on the clustering key
    * gives every output file a disjoint key range, and the
    * within-partition sort orders row groups inside each file, so
    * Parquet footer min/max stats let any key-range predicate skip
    * whole files and row groups at planning/scan time (Spark's parquet
    * filter pushdown does this automatically — but only if the writer
    * produced non-overlapping stats, which a hash-partitioned write
    * never does: every file then spans the full key range and nothing
    * skips). Secondary sort keys refine row-group locality for
    * composite predicates.
    *
    * At 100 TB this runs once per publish: one range shuffle (the
    * sampled range partitioner bounds driver state at |partitions|
    * scalars), then embarrassingly-parallel sorted writes. Pair with
    * `partitionBy(date)` for coarse static pruning + this for fine
    * intra-partition skipping. PipelineSpec pins the disjointness. */
  def clusteredWrite(
      df: DataFrame,
      keyCol: String,
      numFiles: Int,
      dir: String,
      secondarySort: Seq[String] = Nil): Unit =
    df.repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions((keyCol +: secondarySort).map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(dir)

  // ------------------------------------------------ versioned snapshots

  /** Versioned snapshot write (time-travel-lite — the Delta/Iceberg
    * commit idea re-grounded on plain Parquet): each publish lands in
    * an immutable `v=N` subdirectory, and a `_latest` pointer file is
    * swapped in with an atomic rename ONLY after the data write
    * completed — readers either see the previous consistent version or
    * the new one, never a half-written directory. Old versions stay
    * readable (audit / rollback / reproducing a training run) until
    * [[vacuumVersions]] retires them. Returns the new version number.
    *
    * Concurrency contract (same as [[upsert]]): one writer per table —
    * the rename is the commit point, not a lock. */
  def writeVersioned(spark: SparkSession, df: DataFrame,
                     tableDir: String): Int = {
    val next = versions(tableDir).lastOption.getOrElse(0) + 1
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$tableDir/v=$next")
    val tmp = java.nio.file.Paths.get(tableDir, s"._latest.tmp$next")
    java.nio.file.Files.writeString(tmp, next.toString)
    java.nio.file.Files.move(tmp,
      java.nio.file.Paths.get(tableDir, "_latest"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Committed versions of a [[writeVersioned]] table, ascending. */
  def versions(tableDir: String): Seq[Int] = {
    val d = new java.io.File(tableDir)
    val kids = Option(d.listFiles()).getOrElse(Array.empty)
    kids.collect {
      case f if f.isDirectory && f.getName.startsWith("v=") =>
        f.getName.stripPrefix("v=").toInt
    }.sorted.toSeq
  }

  /** Read a specific snapshot (time travel) or, by default, the version
    * the `_latest` commit pointer names — NOT simply the max directory,
    * so a crashed writer's orphan `v=N` (data written, pointer never
    * swapped) is invisible until its commit completes. */
  def readVersion(spark: SparkSession, tableDir: String,
                  version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse {
      val p = java.nio.file.Paths.get(tableDir, "_latest")
      require(java.nio.file.Files.exists(p),
        s"$tableDir has no committed version (_latest missing)")
      java.nio.file.Files.readString(p).trim.toInt
    }
    spark.read.parquet(s"$tableDir/v=$v")
  }

  /** Retire all but the newest `keep` committed versions (the vacuum
    * half of the snapshot lifecycle). Only versions BELOW the `_latest`
    * pointer are eligible: the pointed-at version is live, and anything
    * above it is an in-flight commit (data written, pointer not yet
    * swapped) that vacuum must never race. Returns the dropped
    * version numbers. */
  def vacuumVersions(tableDir: String, keep: Int = 2): Seq[Int] = {
    require(keep >= 1, "must keep at least the latest version")
    val latestPath = java.nio.file.Paths.get(tableDir, "_latest")
    require(java.nio.file.Files.exists(latestPath),
      s"$tableDir has no committed version (_latest missing) — " +
        "not a versioned table, or no commit completed; refusing to vacuum")
    val latest = java.nio.file.Files.readString(latestPath).trim.toInt
    val drop = versions(tableDir).filter(_ < latest).dropRight(keep - 1)
    drop.foreach { v =>
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(s"$tableDir/v=$v"))
    }
    drop
  }

  /** Execute a small-file compaction (the OPTIMIZE half of
    * q_compaction_plan): rewrite the directory into
    * ⌈rows/targetRowsPerFile⌉ files and COMMIT BY DIRECTORY RENAME —
    * the live dir is never written in place, so readers of the old
    * layout keep working until the swap (their already-open files stay
    * valid), a crash at any point leaves a recoverable state, and the
    * rewrite is re-runnable (PipelineSpec pins count + content equality,
    * the file-count drop, and crash-point recovery). Row content is
    * untouched.
    *
    * Commit protocol (each step is a single directory rename):
    *  1. write the compacted copy to `<dir>.compact_staging`
    *     (beside, never inside, the target);
    *  2. verify the staged row count;
    *  3. rename live → `<dir>.compact_old` (retire);
    *  4. rename staging → live (publish);
    *  5. delete the retiree.
    *
    * Entry first recovers any state a previous crashed run left, in
    * reverse swap order: a missing live dir beside a `.compact_old`
    * means the crash hit between renames 3 and 4 — the retiree is a
    * complete pre-compaction layout, so it is rolled back to live; a
    * `.compact_old` beside a live dir (crash between 4 and 5) is
    * droppable; a leftover `.compact_staging` (crash before 3) is
    * droppable, possibly partial. */
  def compact(spark: SparkSession, dir: String,
              targetRowsPerFile: Long): Int = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = dir.stripSuffix("/")
    val staging = s"$base.compact_staging"
    val retired = s"$base.compact_old"
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
    // crash recovery from a previous interrupted run (see scaladoc)
    if (!Files.exists(Paths.get(base)) && Files.exists(Paths.get(retired)))
      Files.move(Paths.get(retired), Paths.get(base),
        StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(Paths.get(retired))) rm(new java.io.File(retired))
    if (Files.exists(Paths.get(staging))) rm(new java.io.File(staging))

    val df = spark.read.parquet(base)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRowsPerFile).toInt)
    df.repartition(files).write.mode(SaveMode.Overwrite).parquet(staging)
    require(spark.read.parquet(staging).count() == n,
      "compaction must not change row count")
    Files.move(Paths.get(base), Paths.get(retired),
      StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(staging), Paths.get(base),
      StandardCopyOption.ATOMIC_MOVE)
    rm(new java.io.File(retired))
    files
  }
}
