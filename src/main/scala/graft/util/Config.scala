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
  * | SPARK_GRAFT_DISK_MEMO | cross-session parquet cache for heavy deterministic fixture intermediates ([[FixtureCache]]) | true |
  * | SPARK_GRAFT_CACHE_DIR | FixtureCache root | $tmpdir/graft_fixture_cache |
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
}
