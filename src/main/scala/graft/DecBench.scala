package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables

/** Dev-only A/B: does narrowing the r4s cast from decimal(28,10) to
  * decimal(18,6) materially speed the aggregation-bound queries?
  * RESULT (r6, sf0.1, interleaved 5 reps): NO — medians 1.05 s vs
  * 1.13 s (within noise). Spark's Decimal stays compact-long-backed
  * while the UNSCALED VALUE fits 18 digits regardless of the declared
  * precision, so the wider declaration costs nothing at these
  * magnitudes; the (28,10) headroom is kept everywhere since it is
  * what makes the discipline safe past SF100. Not a driver artifact. */
object DecBench {
  private def q1(s: SparkSession, dir: String, scale: String): DataFrame = {
    import s.implicits._
    val disc = ($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(scale)
    val chrg = ($"l_extendedprice" * (lit(1.0) - $"l_discount") *
      (lit(1.0) + $"l_tax")).cast(scale)
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity".cast(scale)), 4).cast("double").as("sum_qty"),
        round(sum($"l_extendedprice".cast(scale)), 4).cast("double").as("sum_base"),
        round(sum(disc), 4).cast("double").as("sum_disc"),
        round(sum(chrg), 4).cast("double").as("sum_chrg"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = graft.util.Config.sfDir
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      // deterministic bucket-aware scans for the FixtureCache bucketed
      // tables (and g_bkt_*): the session-memo persist freezes the first
      // planned scan, so auto mode would freeze whichever shape the
      // first-touching query preferred
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val variants = Seq(
      "dec28_10" -> (() => q1(spark, sfDir, "decimal(28,10)")),
      "dec18_6" -> (() => q1(spark, sfDir, "decimal(18,6)")))
    variants.foreach { case (_, f) => f().collect() } // warm
    val times = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to 5).foreach { _ =>
      variants.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        f().collect()
        times(name) :+= (System.nanoTime() - t0) / 1e9
      }
    }
    times.toSeq.sortBy(_._1).foreach { case (n, ts) =>
      val s = ts.sorted
      println(f"[decbench] $n%-10s median ${s(s.size / 2)}%.3f s  " +
        s.map(t => f"$t%.2f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}
