package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.etl.CorpusPipeline
import graft.util.Tables

/** The composed training-data pipeline: monotone stage counts, correct
  * per-stage semantics, and a lang-partitioned sink. */
class CorpusPipelineSpec extends SparkSpec {

  test("quality → exact-dedup → near-dedup → partitioned write") {
    val docs = Tables.documents(spark, sf)
    val nearPairs = SparkEntry.all("q_dedup_near").fn(spark, sf)
      .select(col("da"), col("db"))
    val sink = Files.createTempDirectory("graft_corpus").toString + "/c"
    val stats = CorpusPipeline.run(docs, nearPairs, sink, minQuality = 0.3)

    assert(stats.input === 500)
    assert(stats.afterQuality <= stats.input)
    assert(stats.afterExact <= stats.afterQuality)
    assert(stats.afterNear <= stats.afterExact)
    assert(stats.afterNear > 0)

    val out = spark.read.parquet(sink)
    assert(out.count() === stats.afterNear)
    // partitioned by lang: each partition dir holds exactly one lang
    assert(out.select("lang").distinct().count() > 1)
    val dirs = new java.io.File(sink).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("lang=")), dirs.toSeq)
    // no surviving doc is a near-dup loser
    val losers = nearPairs.select(col("db").as("doc_id")).distinct()
    assert(out.join(losers, Seq("doc_id"), "inner").count() === 0)
    // exact-dedup really removed the duplicate texts
    assert(out.groupBy("text").count().filter(col("count") > 1).count() === 0)
  }

  test("gopherKeep matches q_gopher_filter's keep column; pipeline applies it") {
    val docs = Tables.documents(spark, sf)
    val fromQuery = SparkEntry.all("q_gopher_filter").fn(spark, sf)
      .filter(col("keep") === 1L).count()
    val fromPredicate = docs.filter(CorpusPipeline.gopherKeep(col("text"))).count()
    assert(fromPredicate === fromQuery)
    val nearPairs = SparkEntry.all("q_dedup_near").fn(spark, sf)
      .select(col("da"), col("db"))
    val sink = java.nio.file.Files.createTempDirectory("graft_gopher").toString + "/c"
    val stats = CorpusPipeline.run(docs, nearPairs, sink,
      minQuality = 0.0, applyGopherRules = true)
    assert(stats.afterQuality === fromPredicate)
  }

  test("canonicalStar (large/small-star CC) == q_dedup_canonical's propagation") {
    val docs = Tables.documents(spark, sf)
    val nearPairs = SparkEntry.all("q_dedup_near").fn(spark, sf)
      .select(col("da"), col("db"))
    val star = CorpusPipeline.canonicalStar(docs, nearPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val prop = SparkEntry.all("q_dedup_canonical").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(star === prop)
  }

  test("transitive (canonical) near-dedup keeps exactly the cluster canonicals") {
    val docs = Tables.documents(spark, sf)
    val canonical = SparkEntry.all("q_dedup_canonical").fn(spark, sf)
    val kept = CorpusPipeline.dropNearDupsCanonical(docs, canonical)
    val expected = canonical.filter(col("kept") === 1L).count()
    assert(kept.count() === expected)
    // transitive removal is at least as aggressive as pairwise
    val nearPairs = SparkEntry.all("q_dedup_near").fn(spark, sf)
      .select(col("da"), col("db"))
    val pairwise = CorpusPipeline.dropNearDups(docs, nearPairs)
    assert(kept.count() <= pairwise.count())
  }

  test("quality-aware near-dedup keeps q_dedup_best's pick per cluster") {
    val docs = Tables.documents(spark, sf)
    val canonical = SparkEntry.all("q_dedup_canonical").fn(spark, sf)
    val kept = CorpusPipeline.dropNearDupsBest(docs, canonical)
    // one survivor per cluster — same count as the id-keyed policy,
    // different (quality-driven) membership
    assert(kept.count() === canonical.filter(col("kept") === 1L).count())
    // survivors are exactly the oracle-verified q_dedup_best picks
    val picks = SparkEntry.all("q_dedup_best").fn(spark, sf)
      .select(col("best_doc").as("doc_id"))
    assert(kept.select("doc_id").except(picks).count() === 0)
    assert(picks.except(kept.select("doc_id")).count() === 0)
    // and a kept doc never has a strictly higher-scored cluster-mate
    val words = split(col("text"), " ")
    val scored = docs.select(col("doc_id"),
      (size(array_distinct(words)).cast("long") * 1000000L +
        size(words).cast("long")).as("s"))
    val j = canonical.select("doc_id", "canonical").join(scored, "doc_id")
    val maxPer = j.groupBy("canonical").agg(max(col("s")).as("mx"))
    val keptScores = kept.select(col("doc_id"))
      .join(j, "doc_id").join(maxPer, "canonical")
    assert(keptScores.filter(col("s") < col("mx")).count() === 0)
  }
}
