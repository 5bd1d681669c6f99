package graft.util

/** The engine's environment-variable config surface, in one documented
  * place — the neutral analog of the reference's `.env` keys
  * (`scripts/energy_etl.py:13-14`, GCP project/dataset via dotenv).
  * Every dev-tool main (`Bench`, `Verify`, `QTimer`, `ScaleProbe`,
  * `ABBench`, `TriageBench`, `DecBench`) reads through here, so the
  * knob inventory and its defaults can't drift between tools.
  *
  * | Variable | Meaning | Default |
  * |---|---|---|
  * | SPARK_GRAFT_SF_DIR    | fixture dir (parquet tables)        | /root/testdata/sf0.1 |
  * | SPARK_GRAFT_CPUS      | local[n] cores = shuffle partitions | per-tool (4 for driver-run mains, 32 for dev benches) |
  * | SPARK_GRAFT_AQE       | adaptive execution on/off (Bench)   | true |
  * | SPARK_GRAFT_BENCH_OUT | full bench-JSON output path         | bench_out.json |
  * | SPARK_GRAFT_PROBE_OPS | comma list overriding ScaleProbe's flagship set | (flagships) |
  * | SPARK_GRAFT_PROBE_STOPWORDS | ScaleProbe: replicate documents with the SAME token space (posting lists / group sizes grow xN — the stopword-heavy shape) instead of replica-disjoint tokens | false |
  * | SPARK_GRAFT_PROBE_DISK_MEMO | ScaleProbe: keep the FixtureCache ON against a throwaway root — the reps then measure the bucketed-cache CONSUMER read path | false |
  * | SPARK_GRAFT_DISK_MEMO | cross-session parquet cache for heavy deterministic fixture intermediates ([[FixtureCache]]) | true |
  * | SPARK_GRAFT_CACHE_DIR | FixtureCache root | $tmpdir/graft_fixture_cache |
  * | SPARK_GRAFT_CACHE_BUCKETS | bucket count for FixtureCache bucketed publishes (caps the cached side's scan parallelism — see [[FixtureCache]] sizing rule) | 8 |
  * | SPARK_GRAFT_BENCH_REFS | comma list of trailing bench artifacts for Bench's per-query suspect-head guard | bench_out.json |
  */
object Config {
  def sfDir: String =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

  /** Driver-run mains (Bench/Verify) default low — the driver sets the
    * real value; dev benches default to the full box. */
  def cpus(default: String): String =
    sys.env.getOrElse("SPARK_GRAFT_CPUS", default)

  def aqe: String = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")

  def benchOut: String =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")

  def probeOps: Option[Seq[String]] =
    sys.env.get("SPARK_GRAFT_PROBE_OPS")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))

  def probeStopwords: Boolean =
    sys.env.get("SPARK_GRAFT_PROBE_STOPWORDS").exists(_.toBoolean)

  /** Bucket count for [[FixtureCache]] bucketed publishes. System
    * property first (tests flip it per-JVM), then env. The count is
    * part of the cache fingerprint, so changing it re-keys entries —
    * it can never serve a table whose CLUSTERED BY spec disagrees with
    * its files. */
  def cacheBuckets: Int =
    sys.props.get("graft.cacheBuckets")
      .orElse(sys.env.get("SPARK_GRAFT_CACHE_BUCKETS"))
      .map(_.trim.toInt).getOrElse(8)

  /** Whole-stage-codegen class-cache capacity
    * (`spark.sql.codegen.cache.maxEntries`, Spark default 100). The
    * declared surface is ~240 distinct queries × ~8 codegen units each,
    * so under the default the janino cache thrashes: by the time the
    * bench's timed pass (or Verify's oracle pass) re-runs a query, its
    * generated classes are long evicted and every single query pays
    * full recompilation (measured r13: 0.3-1.5 s/query; a 10-query
    * interleaved A/B read 21.6 s → 16.2 s total at WORSE steal).
    * Production analog: any long-running driver serving a large query
    * corpus sizes this cache to its working set — the cost is a bounded
    * set of compiled classes on the driver heap, independent of data
    * scale or core count. 4000 covers the full surface with headroom. */
  def codegenCacheEntries: String =
    sys.props.get("graft.codegenCacheEntries")
      .orElse(sys.env.get("SPARK_GRAFT_CODEGEN_CACHE"))
      .getOrElse("4000")

  /** Trailing bench artifacts (comma list of paths) for the per-query
    * suspect-head guard in [[graft.Bench]]; entries recorded at a
    * different SF dir are ignored at read time. */
  def benchRefs: Seq[String] =
    sys.env.get("SPARK_GRAFT_BENCH_REFS")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq("bench_out.json"))
}
