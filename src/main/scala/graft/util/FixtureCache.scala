package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * fingerprint hashes the build's LOGIC VERSION plus each input table's
  * file census (name, length, mtime), so editing an operator or
  * regenerating a fixture invalidates the entry by construction —
  * there is no in-place mutation to go stale against. Publication is
  * atomic (write to a pid-suffixed temp dir, rename into place); a
  * concurrent builder losing the rename race discards its copy and
  * reads the winner's.
  *
  * The cache changes WHERE a memoized lineage's rows come from, never
  * what they are: every backed build is deterministic (pinned by the
  * oracle gate, which runs identically on hit and miss), and
  * [[parquetBacked]] returns a plain parquet scan either way, so
  * downstream plans see one stable shape.
  *
  * Knobs: `SPARK_GRAFT_DISK_MEMO=false` (env) or `graft.diskMemo=false`
  * (system property — set by ScaleProbe, whose synthesized throwaway
  * dirs would only pollute the cache) disables it;
  * `SPARK_GRAFT_CACHE_DIR` relocates the root (default
  * `$java.io.tmpdir/graft_fixture_cache`). */
object FixtureCache {

  def enabled: Boolean =
    sys.props.get("graft.diskMemo")
      .orElse(sys.env.get("SPARK_GRAFT_DISK_MEMO"))
      .forall(_.trim.equalsIgnoreCase("true"))

  def root: String = sys.props.get("graft.cacheDir")
    .orElse(sys.env.get("SPARK_GRAFT_CACHE_DIR"))
    .getOrElse(s"${System.getProperty("java.io.tmpdir")}/graft_fixture_cache")

  /** Return `key`'s cached frame for the fixture at `dir`, building and
    * publishing it first on a miss. `inputs` names the fixture tables
    * the build reads (e.g. `Seq("documents")`) — they drive the
    * staleness fingerprint. Bump `version` whenever the build's
    * SEMANTICS change so old entries can never serve the new logic. */
  def parquetBacked(s: SparkSession, dir: String, key: String,
      inputs: Seq[String], version: String = "1")(
      build: => DataFrame): DataFrame = {
    if (!enabled) return build
    val entry = new java.io.File(root, s"$key-${fingerprint(dir, inputs, version)}")
    if (!new java.io.File(entry, "_SUCCESS").exists()) {
      val tmp = new java.io.File(root,
        s".tmp-${entry.getName}-${ProcessHandle.current().pid()}-${System.nanoTime()}")
      try {
        build.write.mode("overwrite").parquet(tmp.toString)
        entry.getParentFile.mkdirs()
        // rename is atomic on one filesystem; losing the race to a
        // concurrent publisher means an identical table already sits at
        // the destination — drop ours and read theirs
        if (!tmp.renameTo(entry)) rm(tmp)
      } catch { case e: Throwable => rm(tmp); throw e }
    }
    s.read.parquet(entry.toString)
  }

  /** SHA-256 (first 16 hex chars) over the logic version, the canonical
    * fixture path, and each input table's file census. mtime+length of
    * every part file: a regenerated fixture — even to identical bytes —
    * reads as a new dataset, which costs one rebuild and can never
    * serve stale rows. */
  private def fingerprint(dir: String, inputs: Seq[String],
      version: String): String = {
    val sb = new StringBuilder(version).append('\n')
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
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
  }

  private def rm(f: java.io.File): Unit = {
    val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
    f.delete(): Unit
  }
}
