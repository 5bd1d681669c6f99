package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-6 operators — properties that hold
  * by DEFINITION of each operator, checked independently of the DuckDB
  * oracle path (which pins engine agreement, not meaning):
  *  - skyline: output is exactly the non-dominated set;
  *  - markov: outgoing probabilities are a distribution per state;
  *  - ewma: a convex combination stays inside the trailing window's range;
  *  - triangles: the degree-ordered count equals a brute-force count.
  */
class OperatorInvariantsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.all(name).fn(spark, sf)

  test("q_skyline emits exactly the non-dominated (price, max-date) points") {
    import spark.implicits._
    val pts = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy($"o_totalprice".as("price"))
      .agg(max(to_date($"o_orderdate")).as("d"))
      .as[(Double, java.sql.Date)].collect()
    val expected = pts.filter { case (p, d) =>
      !pts.exists { case (p2, d2) =>
        (p2 >= p && d2.compareTo(d) >= 0) && (p2 > p || d2.after(d))
      }
    }.toSet
    val got = run("q_skyline").as[(Double, java.sql.Date)].collect().toSet
    assert(got === expected)
  }

  test("q_markov_transition rows are a probability distribution per prev") {
    import spark.implicits._
    val rows = run("q_markov_transition")
      .select($"prev", $"cnt", $"total", $"prob")
      .as[(String, Long, Long, Double)].collect()
    rows.groupBy(_._1).foreach { case (prev, rs) =>
      // per-state counts sum to the state's total...
      assert(rs.map(_._2).sum === rs.head._3, prev)
      // ...and probabilities to 1 within float tolerance
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-9, prev)
    }
  }

  test("q_ewma lies within [min, max] of the trailing 10 daily values") {
    import spark.implicits._
    val daily = run("q_ewma")
      .select($"event_type", $"date", $"daily", $"ewma")
      .as[(String, java.sql.Date, Double, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2.getTime))
    // q_ewma drops the first 9 rows per type, so re-derive the full daily
    // series from events to get each row's complete trailing window
    val full = spark.read.parquet(s"$sf/events.parquet")
      .groupBy($"event_type", to_date($"ts").as("date"))
      .agg(round(sum($"value"), 4).as("daily"))
      .as[(String, java.sql.Date, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2.getTime).map(_._3)).toMap
    daily.foreach { case (tpe, rows) =>
      val series = full(tpe)
      rows.zipWithIndex.foreach { case ((_, _, _, ewma), i) =>
        // row i of the ewma output ends at series index i+9
        val window = series.slice(i, i + 10)
        assert(ewma >= window.min - 1e-6 && ewma <= window.max + 1e-6,
          s"$tpe row $i: $ewma outside [${window.min}, ${window.max}]")
      }
    }
  }

  test("q_winsorized_mean: lo ≤ p50-ish wmean ≤ hi and bounds are real values") {
    import spark.implicits._
    val rows = run("q_winsorized_mean")
      .select($"event_type", $"lo", $"hi", $"wmean")
      .as[(String, Double, Double, Double)].collect()
    val values = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { case (t, lo, hi, wm) =>
      assert(lo <= hi && wm >= lo - 1e-4 && wm <= hi + 1e-4, s"$t: $lo $wm $hi")
      // the disc quantile picks ACTUAL sample values, never interpolates
      assert(values(t).contains(lo) && values(t).contains(hi), t)
    }
  }

  test("q_degree_hist masses sum to the symmetric edge count; " +
    "q_sample_weighted takes exactly min(5, |source|) docs per source") {
    import spark.implicits._
    val hist = run("q_degree_hist").as[(Long, Long)].collect()
    val edges = run("q_dedup_lsh").count()
    assert(hist.map(h => h._1 * h._2).sum === 2 * edges)
    val per = run("q_sample_weighted").groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    val sizes = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    sizes.foreach { case (src, n) =>
      assert(per.getOrElse(src, 0L) === math.min(5L, n), src)
    }
  }

  test("q_sim_report partners carry the exact verified-pair Jaccard, top-3") {
    import spark.implicits._
    val vp = run("q_dedup_near").as[(Long, Long, Double)].collect()
      .flatMap { case (a, b, j) => Seq((a, b) -> j, (b, a) -> j) }.toMap
    val rep = run("q_sim_report")
      .as[(Long, Long, Double, Long)].collect()
    rep.foreach { case (d, p, j, rk) =>
      assert(vp((d, p)) === j, s"$d->$p")
      assert(rk >= 1 && rk <= 3)
    }
    // ranks are the TOP of each doc's partner list, not an arbitrary 3
    rep.groupBy(_._1).foreach { case (d, rs) =>
      val best = vp.collect { case ((a, _), j) if a == d => j }.toSeq
        .sorted(Ordering[Double].reverse).take(rs.size)
      assert(rs.map(_._3).sorted === best.sorted, s"doc $d")
    }
  }

  test("q_triangle_count matches a brute-force triangle enumeration") {
    import spark.implicits._
    val edges = run("q_dedup_lsh").as[(Long, Long)].collect().toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val perNode = scala.collection.mutable.Map.empty[Long, Long]
    // brute force: da<db<dc with all three edges present (ids ordered)
    for {
      (a, b) <- edges
      c <- adj.getOrElse(b, Set.empty)
      if adj.getOrElse(a, Set.empty).contains(c)
    } Seq(a, b, c).foreach(n => perNode(n) = perNode.getOrElse(n, 0L) + 1L)
    val got = run("q_triangle_count").as[(Long, Long)].collect().toMap
    assert(got === perNode.toMap)
    assert(nodes.nonEmpty) // fixture sanity: the graph isn't empty
  }
}
