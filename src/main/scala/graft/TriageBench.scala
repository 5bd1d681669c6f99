package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables

/** Round-5 triage: interleaved reps of (a) the two substring-dedup
  * count shapes and (b) untouched control queries, in one JVM —
  * BASELINE.md protocol. Run twice (SPARK_DRIVER_MEM=8g / 48g) to
  * separate plan effects from heap effects. Dev tool, not a driver
  * artifact. */
object TriageBench {

  private def substringBase(s: SparkSession, dir: String) = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val w = split($"text", " ")
    val m = greatest(size(w) - 7, lit(0))
    val grams = when(m > 0,
      transform(sequence(lit(1), m), i => xxhash64(slice(w, i, lit(8)))))
      .otherwise(array().cast("array<bigint>"))
    (docs, m, docs.select($"doc_id", explode(grams).as("gh")))
  }

  private def subWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val (docs, _, ex) = substringBase(s, dir)
    val per = ex
      .withColumn("c", count(lit(1)).over(Window.partitionBy($"gh")))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(($"c" > 1).cast("long")).as("n_dup"))
    docs.select($"doc_id").join(per, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_grams", lit(0L)).as("n_grams"),
        coalesce($"n_dup", lit(0L)).as("n_dup"))
      .orderBy($"doc_id")
  }

  private def subSemi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (docs, m, ex) = substringBase(s, dir)
    val dupKeys = ex.groupBy($"gh").agg(count(lit(1)).as("c"))
      .filter($"c" > 1).select($"gh")
    val dupPer = ex.join(dupKeys, Seq("gh"), "left_semi")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_dup"))
    docs.select($"doc_id", m.cast("long").as("n_grams"))
      .join(dupPer, Seq("doc_id"), "left")
      .select($"doc_id", $"n_grams", coalesce($"n_dup", lit(0L)).as("n_dup"))
      .orderBy($"doc_id")
  }

  /** One explode, no sort: pre-aggregate per (doc_id, gh) so the
    * corpus-count branch and the per-doc branch share ONE exchange
    * (ReuseExchange) instead of re-running the explode kernel. */
  private def subReuse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (docs, m, ex) = substringBase(s, dir)
    val dg = ex.groupBy($"doc_id", $"gh").agg(count(lit(1)).as("k"))
    val dup = dg.groupBy($"gh").agg(sum($"k").as("c"))
      .filter($"c" > 1).select($"gh")
    val dupPer = dg.join(dup, Seq("gh"), "left_semi")
      .groupBy($"doc_id").agg(sum($"k").as("n_dup"))
    docs.select($"doc_id", m.cast("long").as("n_grams"))
      .join(dupPer, Seq("doc_id"), "left")
      .select($"doc_id", $"n_grams", coalesce($"n_dup", lit(0L)).as("n_dup"))
      .orderBy($"doc_id")
  }

  /** lang-ID variant B: explode the corpus TWICE but give each branch
    * its natural aggregation key — train collapses straight to
    * (lang, tg) (tiny after map-side combine), test (20% of docs) to
    * (doc, lang, tg). Trades one big (doc,lang,tg) shuffle of the full
    * corpus (the current ReuseExchange shape) for two explodes with
    * far smaller shuffles. */
  private def langIdTwoExplode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    def cp3(i: Column): Column = ascii($"text".substr(i, lit(1))).cast("long")
    val triCol =
      if (s.catalog.functionExists("graft_char3grams"))
        call_function("graft_char3grams", $"text")
      else transform(
        sequence(lit(1), greatest(length($"text") - 2, lit(1))),
        i => (cp3(i) * 1021L + cp3(i + 1)) * 1021L + cp3(i + 2))
    val docs = Tables.spread(Tables.documents(s, dir), "doc_id")
    val prof = docs.filter($"doc_id" % 5 =!= 0)
      .select($"lang".as("plang"), explode(triCol).as("tg"))
      .groupBy($"plang", $"tg").agg(count(lit(1)).as("pc"))
    val tf = docs.filter($"doc_id" % 5 === 0)
      .select($"doc_id", $"lang", explode(triCol).as("tg"))
      .groupBy($"doc_id", $"lang", $"tg").agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"plang")
    tf.join(broadcast(prof), "tg")
      .groupBy($"doc_id", $"lang", $"plang")
      .agg(sum($"tf" * $"pc").as("score"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"doc_id", $"lang", $"plang".as("pred_lang"), $"score")
      .orderBy($"doc_id")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = graft.util.Config.sfDir
    val cpus = graft.util.Config.cpus("32")
    val reps = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
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

    val cases: Seq[(String, () => DataFrame)] = Seq(
      "substring_window" -> (() => subWindow(spark, sfDir)),
      "substring_semijoin" -> (() => subSemi(spark, sfDir)),
      "substring_reuse" -> (() => subReuse(spark, sfDir)),
      "substring_q_current" -> (() => SparkEntry.all("q_dedup_substring").fn(spark, sfDir)),
      "ctl_filter_pred" -> (() => SparkEntry.all("q_filter_pred").fn(spark, sfDir)),
      "ctl_daily_avg" -> (() => SparkEntry.all("q_daily_avg").fn(spark, sfDir)),
      "ctl_date_funcs" -> (() => SparkEntry.all("q_date_funcs").fn(spark, sfDir)),
      // VERDICT r4 item 1's named unchanged-but-regressed set — the
      // formal interleaved-reps readout for the contention diagnosis
      "ctl_lang_id" -> (() => SparkEntry.all("q_lang_id").fn(spark, sfDir)),
      // VERDICT r5 items 4-5: the two queries whose driver readings
      // moved >2× without a code change — interleaved medians are the
      // contention-robust readout
      "ctl_lateral" -> (() => SparkEntry.all("q_lateral").fn(spark, sfDir)),
      "langid_two_explode" -> (() => langIdTwoExplode(spark, sfDir)),
      "ctl_agg_approx" -> (() => SparkEntry.all("q_agg_approx").fn(spark, sfDir)),
      "ctl_window_dist" -> (() => SparkEntry.all("q_window_dist").fn(spark, sfDir)),
      "ctl_union_all" -> (() => SparkEntry.all("q_union_all").fn(spark, sfDir)),
      "ctl_window_frame" -> (() => SparkEntry.all("q_window_frame").fn(spark, sfDir)))

    if (args.contains("explain")) {
      Seq("substring_window" -> subWindow(spark, sfDir),
        "substring_semijoin" -> subSemi(spark, sfDir),
        "substring_reuse" -> subReuse(spark, sfDir)).foreach { case (n, df) =>
        df.write.format("noop").mode("overwrite").save()
        println(s"==== $n FINAL PLAN ====")
        println(df.queryExecution.executedPlan.toString.take(4000))
      }
      spark.stop(); return
    }
    // warm-up round (untimed)
    cases.foreach { case (_, f) =>
      try f().write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"warm fail: ${e.getMessage}") }
    }
    val times = scala.collection.mutable.Map[String, List[Double]]()
    (1 to reps).foreach { _ =>
      cases.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = dt :: times.getOrElse(name, Nil)
      }
    }
    val heapGb = Runtime.getRuntime.maxMemory / 1e9
    println(f"TRIAGE heap=${heapGb}%.1fgb sf=$sfDir cpus=$cpus")
    cases.foreach { case (name, _) =>
      val ts = times(name).sorted
      println(f"TRIAGE $name%-22s median=${ts(ts.length / 2)}%7.2f  reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
