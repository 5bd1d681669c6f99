package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables

/** Interleaved A/B micro-benchmark for plan variants (BASELINE.md
  * protocol: the local box drifts ±20% run-to-run, so variant timings
  * are only comparable as interleaved reps inside ONE JVM — never as
  * bench-total deltas across runs). Used for the r3 regression triage
  * of q_vec_centroid / q_daily_avg / q_watermark_max; kept as a tool
  * because every perf decision in this repo needs the same protocol.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *          sbt "runMain graft.ABBench [reps]"
  * Prints per-variant sorted rep times + median.
  */
object ABBench {

  private def variants(s: SparkSession, dir: String): Seq[(String, () => DataFrame)] = {
    import s.implicits._
    def centroid(src: DataFrame, decimal: Boolean): DataFrame = {
      val sumCol =
        if (decimal)
          ops.Incremental.r4a(sum($"col".cast("double").cast("decimal(28,10)")),
            count(lit(1)))
        else sum($"col".cast("double")) / count(lit(1))
      src.select($"label".cast("long").as("label"), posexplode($"embedding"))
        .groupBy($"label", ($"pos" + 1).cast("long").as("pos"))
        .agg(sumCol.as("centroid"), count(lit(1)).as("n"))
        .orderBy($"label", $"pos")
    }
    def dailyAvg(src: DataFrame): DataFrame =
      src.groupBy(to_date($"ts").as("date"), $"event_type")
        .agg(
          ops.Incremental.r4a(sum($"value".cast("decimal(28,10)")),
            count(lit(1))).as("avg_value"),
          count(lit(1)).as("n"))
        .orderBy($"date", $"event_type")
    val handBuilt = Seq(
      "centroid_spread_decimal" ->
        (() => centroid(Tables.spread(Tables.embeddings(s, dir), "vec_id"), decimal = true)),
      "centroid_nospread_decimal" ->
        (() => centroid(Tables.embeddings(s, dir), decimal = true)),
      "centroid_spread_double" ->
        (() => centroid(Tables.spread(Tables.embeddings(s, dir), "vec_id"), decimal = false)),
      "daily_spread" ->
        (() => dailyAvg(Tables.spread(Tables.events(s, dir), "event_id"))),
      "daily_nospread" ->
        (() => dailyAvg(Tables.events(s, dir))),
      "watermark_current" ->
        (() => Tables.events(s, dir)
          .agg(max(to_date($"ts")).as("latest_date"), count(lit(1)).as("n"))))
    // declared queries timed with the spread fan-out on vs off (the
    // Tables.spreadEnabled hook — builders re-plan per call). ONLY
    // non-memoized spread users belong here: the TextDedup/VectorOps
    // pipelines cache their first build per session, so the toggle
    // would silently compare one plan against itself. Keep a
    // no-spread-call query (q_incremental_delta) as the bias
    // calibration control — its two slots have IDENTICAL plans, so any
    // delta it shows is harness noise, the actionability floor.
    // q_blocklist_filter / q_redact / q_doc_chunks were toggled here in
    // r5: nospread won all three (0.31/0.39/0.37 s vs 0.43/0.48/0.82 s
    // medians), so their spread calls were removed and they left the
    // list (the toggle would now compare identical plans).
    val spreadAB = Seq(
      "q_json_extract", "q_map_funcs", "q_text_tokens", "q_text_quality",
      "q_incremental_delta"
    ).flatMap { q =>
      val fn = SparkEntry.all(q).fn
      Seq(
        s"$q+spread" -> (() => { Tables.spreadEnabled = true; fn(s, dir) }),
        s"$q-nospread" -> (() => { Tables.spreadEnabled = false; fn(s, dir) }))
    }
    // r5: lang-ID trigram front end — fused CharTrigrams kernel vs the
    // interpreted ascii/substr HOF chain. q_lang_id re-plans per call
    // through its functionExists switch, so toggling the registration
    // inside each closure selects the shape; nothing in the lineage is
    // memoized, so both slots execute the full pipeline.
    val langIdAB = {
      val fn = SparkEntry.all("q_lang_id").fn
      val shim = org.apache.spark.sql.graftshim.Shim
      Seq(
        "langid_kernel" -> (() => {
          shim.registerFunction(s, "graft_char3grams",
            c => graft.functions.CharTrigrams(c.head))
          fn(s, dir)
        }),
        "langid_hof" -> (() => {
          shim.dropFunction(s, "graft_char3grams"); fn(s, dir)
        }))
    }
    handBuilt ++ spreadAB ++ langIdAB
  }

  def main(args: Array[String]): Unit = {
    val sfDir = graft.util.Config.sfDir
    val cpus = graft.util.Config.cpus("32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    // optional 2nd arg: substring filter over variant names, so a
    // focused A/B doesn't pay (and isn't polluted by) the full list
    val nameFilter = args.drop(1).headOption
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
    val vs = nameFilter.foldLeft(variants(spark, sfDir)) {
      case (all, f) => all.filter(_._1.contains(f))
    }
    // warm-up: one untimed pass over every variant (JIT + codegen).
    // spreadEnabled defaults true before each build; -nospread builders
    // flip it inside their closure
    vs.foreach { case (_, b) =>
      Tables.spreadEnabled = true
      b().write.format("noop").mode("overwrite").save()
    }
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      vs.foreach { case (name, b) =>
        Tables.spreadEnabled = true
        val t0 = System.nanoTime()
        b().write.format("noop").mode("overwrite").save()
        times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    Tables.spreadEnabled = true
    vs.foreach { case (name, _) =>
      val ts = times(name).sorted
      val med = ts(ts.size / 2)
      println(f"AB $name%-28s median=$med%6.3f  reps=${ts.map(t => f"$t%5.3f").mkString(",")}")
    }
    spark.stop()
  }
}
