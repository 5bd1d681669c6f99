package graft

import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Count-Min sketch envelope (the q_heavy_hitters audit contract —
  * oracle-checked since r8 via the TRUE-pinned envelope booleans):
  * the estimate NEVER under-counts, over-counts by at most εN
  * (ε = e/W — the Cormode-Muthukrishnan guarantee, deterministic here
  * because data and hashes are fixed), and the sketch is invariant
  * under partial-aggregation layout (merge associativity). */
class SketchSpec extends SparkSpec {

  private def wordFrame = {
    import spark.implicits._
    graft.util.Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0)
      .select($"word", xxhash64($"word").as("h"))
  }

  test("CMS estimate >= exact for EVERY word; overshoot within e*N/W") {
    import spark.implicits._
    val cms = udaf(Sketches.countMin, org.apache.spark.sql.Encoders.scalaLong)
    val sketch = wordFrame.agg(cms($"h")).head().getSeq[Long](0).toArray
    val exact = wordFrame.groupBy($"word")
      .agg(count(lit(1)).as("n"), first($"h").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val n = exact.map(_._2).sum
    val bound = math.ceil(math.E * n / Sketches.W).toLong
    exact.foreach { case (w, ex, h) =>
      val est = Sketches.estimate(sketch, h)
      assert(est >= ex, s"$w under-counted: $est < $ex")
      assert(est - ex <= bound, s"$w overshoot ${est - ex} > $bound")
    }
  }

  test("sketch is partition-layout invariant (partial merge associativity)") {
    import spark.implicits._
    val cms = udaf(Sketches.countMin, org.apache.spark.sql.Encoders.scalaLong)
    val a = wordFrame.repartition(7).agg(cms($"h")).head().getSeq[Long](0)
    val b = wordFrame.coalesce(1).agg(cms($"h")).head().getSeq[Long](0)
    assert(a === b)
  }

  test("q_heavy_hitters: top-20 exact counts descend, and both audited " +
    "envelope booleans hold (the columns the oracle pins to TRUE)") {
    val rows = SparkEntry.all("q_heavy_hitters").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    assert(rows.length === 20)
    rows.sliding(2).foreach {
      case Array(x, y) => assert(x._2 >= y._2)
      case _ =>
    }
    rows.foreach { case (w, _, neverUnder, withinEps) =>
      assert(neverUnder, s"$w: CMS under-counted")
      assert(withinEps, s"$w: CMS over-counted beyond eps*N")
    }
  }
}
