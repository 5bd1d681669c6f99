package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-2 query surface (n-gram Jaccard dedup,
  * hyperplane-LSH ANN, SQL-surface subqueries / grouping sets, map
  * functions, distribution windows) beyond the DuckDB value gate —
  * cross-formulation equalities and range/shape properties the oracle
  * compare can't express (SURVEY.md §5.2.2-3).
  */
class SurfaceInvariantsSpec extends SparkSpec {

  test("q_dedup_canonical is a valid corpus filter: clusters agree, kept = canonical") {
    import spark.implicits._
    val rows = SparkEntry.all("q_dedup_canonical").fn(spark, sf)
      .as[(Long, Long, Long)].collect()
    val canon = rows.map(r => r._1 -> r._2).toMap
    // total: one row per corpus doc
    val nDocs = graft.util.Tables.documents(spark, sf).count()
    assert(rows.length.toLong === nDocs)
    rows.foreach { case (doc, c, kept) =>
      assert(c <= doc, s"canonical $c > doc $doc")           // min-id rule
      assert(canon(c) === c, s"canonical $c not its own root") // root closed
      assert((kept == 1L) === (doc == c))
    }
    // every verified near-dup pair is collapsed into one cluster
    SparkEntry.all("q_dedup_near").fn(spark, sf)
      .select("da", "db").as[(Long, Long)].collect()
      .foreach { case (a, b) =>
        assert(canon(a) === canon(b), s"pair ($a,$b) split across clusters")
      }
  }

  test("q_seq_pack bins respect the token budget at bin starts") {
    import spark.implicits._
    // (lang, bin, n_docs, tokens, first_doc, last_doc): bins are
    // contiguous from 0 and a bin's cumulative start is below
    // budget*(bin+1) — the offset packing rule
    val r = SparkEntry.all("q_seq_pack").fn(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.groupBy(_._1).foreach { case (lang, bins) =>
      val ids = bins.map(_._2).sorted
      assert(ids.head === 0L, s"$lang bins start at ${ids.head}")
      assert(ids === (0L until ids.length).toArray.toSeq.map(identity), s"$lang bins not contiguous")
      // cumulative tokens of bins 0..k-1 lie in [512*k - maxdoc, 512*(k+1))
      var cum = 0L
      bins.sortBy(_._2).foreach { case (_, bin, _, toks, _, _) =>
        assert(cum >= 512L * bin && cum < 512L * (bin + 1) || bin == 0,
          s"$lang bin $bin starts at cum $cum")
        cum += toks
      }
    }
  }

  test("q_corpus_mix keeps sources near their configured rates") {
    import spark.implicits._
    val total = graft.util.Tables.documents(spark, sf)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    val kept = SparkEntry.all("q_corpus_mix").fn(spark, sf)
      .select($"source", $"n_kept", $"rate_permille")
      .as[(String, Long, Long)].collect()
    assert(kept.nonEmpty)
    kept.foreach { case (src, n, rate) =>
      val frac = n.toDouble / total(src)
      // hash draw is uniform-ish; wide tolerance (25 docs per source)
      assert(math.abs(frac - rate / 1000.0) < 0.35, s"$src frac $frac vs rate $rate")
    }
  }

  test("q_contamination only flags training docs, with n_shared >= 3") {
    import spark.implicits._
    val r = SparkEntry.all("q_contamination").fn(spark, sf)
      .as[(Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (doc, n) =>
      assert(doc % 50 != 0, s"eval doc $doc flagged as contaminated")
      assert(n >= 3L)
    }
  }

  test("q_dedup_ngram emits canonical pairs with Jaccard in [0.4, 1]") {
    import spark.implicits._
    val r = SparkEntry.all("q_dedup_ngram").fn(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (da, db, jac) =>
      assert(da < db, s"pair ($da,$db) not canonical")
      assert(jac >= 0.4 && jac <= 1.0, s"jac $jac out of range")
    }
  }

  test("q_dedup_containment: canonical pairs, bounded containments, " +
    "contained side is the more-covered doc") {
    import spark.implicits._
    val r = SparkEntry.all("q_dedup_containment").fn(spark, sf)
      .as[(Long, Long, Double, Double, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (da, db, ca, cb, contained) =>
      assert(da < db, s"pair ($da,$db) not canonical")
      assert(ca > 0.0 && ca <= 1.0, s"cont_a $ca out of range")
      assert(cb > 0.0 && cb <= 1.0, s"cont_b $cb out of range")
      assert(math.max(ca, cb) >= 0.5, s"pair ($da,$db) below threshold")
      assert(contained === (if (ca >= cb) da else db),
        s"contained $contained inconsistent with ($ca,$cb)")
    }
  }

  test("identical texts have n-gram Jaccard exactly 1") {
    import spark.implicits._
    // formula check on literal data: duplicate text → gram sets equal
    val d = Seq((1L, "abcdefgh"), (2L, "abcdefgh"), (3L, "zzzzyyyy"))
      .toDF("doc_id", "text")
    val grams = d.select($"doc_id", array_distinct(transform(
      sequence(lit(1), greatest(length($"text") - 3, lit(1))),
      i => $"text".substr(i, lit(4)))).as("gs"))
    val a = grams.select($"doc_id".as("da"), $"gs".as("ga"))
    val b = grams.select($"doc_id".as("db"), $"gs".as("gb"))
    val jac = a.join(b, $"da" < $"db")
      .withColumn("i", size(array_intersect($"ga", $"gb")).cast("double"))
      .withColumn("j",
        $"i" / ((size($"ga") + size($"gb")).cast("double") - $"i"))
      .select($"da", $"db", $"j").as[(Long, Long, Double)].collect()
    assert(jac.find(p => p._1 == 1L && p._2 == 2L).get._3 === 1.0)
    assert(jac.find(p => p._1 == 1L && p._2 == 3L).get._3 === 0.0)
  }

  test("q_sim_lsh: every neighbor shares the query's bucket; ranks are 1..k dense") {
    import spark.implicits._
    val r = SparkEntry.all("q_sim_lsh").fn(spark, sf)
      .select($"qid", $"nid", $"bucket", $"rk")
      .as[(Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (_, _, bucket, _) =>
      assert(bucket >= 0 && bucket < 256, s"bucket $bucket out of 8-bit range")
    }
    r.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq,
        s"query $qid ranks not dense")
      assert(rows.map(_._3).distinct.length == 1,
        s"query $qid mixes buckets") // all candidates from the query's bucket
      assert(!rows.map(_._2).contains(qid), s"query $qid returned itself")
    }
  }

  test("q_subquery (SQL surface) matches the DataFrame formulation") {
    import spark.implicits._
    val sql = SparkEntry.all("q_subquery").fn(spark, sf)
      .as[(Long, Double, Long)].collect().toSeq
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val n = c.count()
    val totBal = c.agg(sum($"c_acctbal".cast("decimal(18,4)")))
      .first().getDecimal(0).doubleValue()
    val big = o.filter($"o_totalprice" > 400000)
      .select($"o_custkey").distinct()
    val urgent = o.filter($"o_orderpriority" === "1-URGENT")
      .groupBy($"o_custkey").agg(count(lit(1)).as("nu"))
    val df = c.filter($"c_acctbal" * n > totBal)
      .join(big, $"c_custkey" === big("o_custkey"), "left_semi")
      .join(urgent, $"c_custkey" === urgent("o_custkey"), "left")
      .select($"c_custkey", $"c_acctbal", coalesce($"nu", lit(0L)).as("n_urgent"))
      .orderBy($"c_custkey")
      .as[(Long, Double, Long)].collect().toSeq
    assert(sql == df)
  }

  test("q_grouping_sets: grand total row equals the whole-table aggregate") {
    import spark.implicits._
    val r = SparkEntry.all("q_grouping_sets").fn(spark, sf)
    val grand = r.filter($"gid" === 3).select($"n").as[Long].collect()
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(grand.toSeq == Seq(total))
    // the finest grouping partitions the table
    val fine = r.filter($"gid" === 0).agg(sum($"n")).as[Long].first()
    assert(fine === total)
  }

  test("q_window_dist: ratios bounded, nth_value null exactly on first row per partition") {
    import spark.implicits._
    val r = SparkEntry.all("q_window_dist").fn(spark, sf)
      .select($"o_orderstatus", $"pr", $"cd", $"nth2")
      .as[(String, Double, Double, Option[Double])].collect()
    r.foreach { case (st, pr, cd, _) =>
      assert(pr >= 0.0 && pr <= 1.0, s"pr $pr in $st")
      assert(cd > 0.0 && cd <= 1.0, s"cd $cd in $st")
    }
    val nullsPerPartition = r.groupBy(_._1).view
      .mapValues(_.count(_._4.isEmpty)).toMap
    assert(nullsPerPartition.values.forall(_ == 1),
      s"expected exactly one null nth2 per partition: $nullsPerPartition")
  }

  test("q_map_funcs k2 doubles q_json_extract's k for every event") {
    import spark.implicits._
    val k = SparkEntry.all("q_json_extract").fn(spark, sf)
      .select($"event_id", $"k_json").as[(Long, Long)].collect().toMap
    val k2 = SparkEntry.all("q_map_funcs").fn(spark, sf)
      .select($"event_id", $"k2").as[(Long, Long)].collect()
    assert(k2.nonEmpty)
    k2.foreach { case (id, v) => assert(v === 2 * k(id)) }
  }
}
