package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the privacy-release gates and the banded
  * fuzzy entity-resolution join — properties that hold by DEFINITION,
  * checked independently of the DuckDB oracle path:
  *  - fuzzy join: the pigeonhole band (prefix5 ∪ suffix4) is COMPLETE —
  *    it finds every lev≤1 pair a brute-force all-pairs scan finds;
  *  - k-anonymity / l-diversity: the census conserves the row count,
  *    flags are pure functions of the level, and l is bounded by the
  *    sensitive attribute's cardinality;
  *  - perplexity buckets: ntile terciles are balanced (sizes differ by
  *    at most 1 within a language) and partition the corpus.
  */
class PrivacyFuzzySpec extends SparkSpec {

  private def run(name: String) = SparkEntry.all(name).fn(spark, sf)

  test("q_fuzzy_join band is complete vs brute-force all-pairs lev<=1") {
    import spark.implicits._
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select($"c_custkey", $"c_nationkey",
        substring($"c_name", 10, 9).as("ck"))
      .as[(Long, Int, String)].collect()
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
      .select($"s_suppkey", $"s_nationkey",
        substring($"s_name", 10, 9).as("sk"))
      .as[(Long, Int, String)].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      (ckey, cn, ck) <- cust
      (skey, sn, sk) <- supp
      if cn == sn && lev(ck, sk) <= 1
    } yield (ckey, skey, lev(ck, sk).toLong)).toSet
    val got = run("q_fuzzy_join")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === brute)
    assert(brute.nonEmpty, "fixture should produce at least one match")
  }

  test("q_dedup_fuzzy (PassJoin) equals brute-force all-pairs lev<=2 " +
    "on the padded 40-char canonical keys") {
    import spark.implicits._
    val keys = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", rpad(substring($"text", 1, 40), 40, "#").as("t"))
      .as[(Long, String)].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      (ida, ta) <- keys; (idb, tb) <- keys
      if ida < idb && lev(ta, tb) <= 2
    } yield (ida, idb, lev(ta, tb).toLong)).toSet
    val got = run("q_dedup_fuzzy").as[(Long, Long, Long)].collect().toSet
    assert(got === brute)
    assert(brute.nonEmpty, "fixture should produce at least one pair")
  }

  test("q_k_anonymity census conserves rows and flags k<5") {
    import spark.implicits._
    val rows = run("q_k_anonymity")
      .as[(Long, Long, Long, Boolean)].collect()
    val nCustomers =
      spark.read.parquet(s"$sf/customer.parquet").count()
    assert(rows.map(_._3).sum === nCustomers)
    rows.foreach { case (k, nGroups, nRows, atRisk) =>
      assert(atRisk === (k < 5))
      assert(nRows === k * nGroups)
    }
  }

  test("q_l_diversity conserves rows; l bounded by segment cardinality") {
    import spark.implicits._
    val rows = run("q_l_diversity")
      .as[(Long, Long, Long, Boolean)].collect()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    assert(rows.map(_._3).sum === cust.count())
    val nSegments = cust.select("c_mktsegment").distinct().count()
    rows.foreach { case (l, _, _, disclosed) =>
      assert(l >= 1 && l <= nSegments)
      assert(disclosed === (l == 1))
    }
  }

  test("q_perplexity_bucket terciles are balanced and partition the corpus") {
    import spark.implicits._
    val rows = run("q_perplexity_bucket")
      .select($"lang", $"bucket", $"n_docs")
      .as[(String, Long, Long)].collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._3).sum === nDocs)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.map(_._2).toSet === Set(1L, 2L, 3L), lang)
      val sizes = rs.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang tercile imbalance")
    }
  }
}
