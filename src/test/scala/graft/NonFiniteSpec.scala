package graft

import org.apache.spark.sql.functions._

/** Non-finite-payload sweep: NaN / ±Infinity planted in every double
  * measure column. The contract this pins has two halves:
  *
  *  1. Statistics/census queries EXCLUDE non-finite values (like
  *     nulls) or propagate them as NaN — they must complete.
  *  2. The exact-cents-grid queries (whose decimal discipline DEPENDS
  *     on grid-valued inputs) must FAIL FAST with an ANSI arithmetic
  *     error — loud refusal, never the silent corruption Spark's own
  *     FLOOR(double) would produce (NaN → 0, ±Inf → ±Long.MaxValue,
  *     no error — the q_try_funcs scaladoc documents that trap).
  *
  * Caught by this sweep: q_rolling_median indexed past its collected
  * window (row count vs collected count), q_ks_test binned ±Inf into
  * an ANSI cast abort, and q_try_funcs's own payload builder silently
  * absorbed FLOOR's NaN → 0. */
class NonFiniteSpec extends SparkSpec {

  // exactness-contract queries: grid-valued inputs required, fail fast
  private val failFast = Set("q_benford", "q_gini", "q_rfm",
    "q_tpch_q1", "q_tpch_q17", "q_tpch_q20", "q_tpch_q22")

  test("non-finite payloads: census queries complete, cents-grid " +
    "queries refuse loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nan").toString
    val doubles = Map(
      "events" -> Seq("value"),
      "orders" -> Seq("o_totalprice"),
      "lineitem" -> Seq("l_extendedprice", "l_discount", "l_quantity"),
      "customer" -> Seq("c_acctbal"), "part" -> Seq("p_retailprice"))
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val df = spark.read.parquet(s"$sf/$t.parquet").limit(30)
        .withColumn("_rn", monotonically_increasing_id())
      doubles.getOrElse(t, Nil).foldLeft(df) { (d, c) =>
        d.withColumn(c,
          when(col("_rn") % 3 === 1, lit(Double.NaN))
            .when(col("_rn") % 3 === 2, lit(Double.PositiveInfinity))
            .otherwise(col(c)))
      }.drop("_rn").write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val outcomes = SparkEntry.all.keys.toSeq.sorted.map { name =>
      name -> (try { SparkEntry.all(name).fn(spark, dir).collect(); None }
        catch { case e: Throwable => Some(e) })
    }
    val unexpectedCrash = outcomes.collect {
      case (n, Some(e)) if !failFast(n) =>
        s"$n: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(100)}"
    }
    assert(unexpectedCrash.isEmpty, unexpectedCrash.mkString("\n"))
    // the contract queries must REFUSE (an arithmetic error), not
    // silently emit a corrupted census
    outcomes.filter(o => failFast(o._1)).foreach { case (n, e) =>
      assert(e.isDefined, s"$n silently accepted non-finite input")
      def chain(t: Throwable): Seq[Throwable] =
        t +: Option(t.getCause).map(chain).getOrElse(Nil)
      assert(chain(e.get).exists(c =>
        c.getClass.getName.contains("ArithmeticException")),
        s"$n failed with the wrong class: ${e.get}")
    }
  }
}
