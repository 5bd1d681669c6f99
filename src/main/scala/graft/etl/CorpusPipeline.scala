package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data corpus pipeline (BASELINE.json north_star: "the
  * operations a large-scale training-data pipeline would need",
  * composed): quality-filter → exact dedup → near-dup removal →
  * language-partitioned write. Each stage is the same logic the
  * declared queries verify (q_text_quality, q_dedup_exact,
  * q_dedup_near's candidate semantics), chained into one lazy plan.
  *
  * Scale shape: stages 1-2 are narrow + one keyed shuffle each; stage 3
  * shuffles only (band, bucket) keys; the final write partitions by
  * lang so downstream per-language jobs get partition pruning.
  */
object CorpusPipeline {

  case class Stats(input: Long, afterQuality: Long, afterExact: Long,
      afterNear: Long)

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Composite quality score in [0,1] — q_text_quality's formula. */
  def qualityScore(text: Column): Column = {
    val words = split(text, " ")
    val nTok = size(words).cast("double")
    val nStop = size(filter(words, w => w.isInCollection(stopwords))).cast("double")
    val nDistinct = size(array_distinct(words)).cast("double")
    when(nTok > 20, lit(1.0)).otherwise(nTok / 20.0) *
      (lit(1.0) - nStop / nTok) * (nDistinct / nTok)
  }

  /** The Gopher/C4 document-filter keep rule (q_gopher_filter's
    * thresholds, published rule set) as a reusable pipeline predicate:
    * word count in [50, 100k], mean word length in [3, 10], ≥ 2
    * distinct stopwords, ≥ 80% words containing a letter. */
  def gopherKeep(text: Column): Column = {
    val w = split(text, " ")
    val n = size(w).cast("long")
    val meanLen = (length(text) - (n - 1)).cast("double") / n.cast("double")
    val alphaFrac = size(filter(w, x => x.rlike("[A-Za-z]"))).cast("double") /
      n.cast("double")
    val nStopD = size(array_intersect(array_distinct(w),
      array(stopwords.map(lit): _*)))
    n >= 50 && n <= 100000 && meanLen >= 3.0 && meanLen <= 10.0 &&
      nStopD >= 2 && alphaFrac >= 0.8
  }

  /** Exact dedup: keep the lowest doc_id per identical text
    * (q_dedup_exact's rule). At 100 TB group on a 128-bit fingerprint
    * of the text rather than the raw string to keep shuffle rows small. */
  def dedupExact(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    docs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Near-dup removal, PAIRWISE policy: among MinHash/LSH candidate
    * pairs with exact Jaccard ≥ threshold, drop the higher doc_id of
    * each pair (the TextDedup candidate machinery re-grounded as a
    * filter). Keeps every doc that is not the greater side of some
    * pair — conservative: in a chain a~b, b~c without an a~c pair,
    * both a and b survive (they were never measured similar). */
  def dropNearDups(docs: DataFrame, nearPairs: DataFrame): DataFrame = {
    val losers = nearPairs.select(col("db").as("doc_id")).distinct()
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Near-dup removal, TRANSITIVE policy: keep only each connected
    * component's canonical doc, from q_dedup_canonical's output
    * (doc_id, canonical, kept). Aggressive: the whole a~b~c chain
    * collapses to a. Use when near-duplication is believed transitive
    * (clone families); the pairwise policy when it is not. */
  def dropNearDupsCanonical(docs: DataFrame, canonical: DataFrame): DataFrame =
    docs.join(canonical.filter(col("kept") === 1L).select("doc_id"),
      Seq("doc_id"), "left_semi")

  /** Near-dup removal, QUALITY-AWARE transitive policy (q_dedup_best's
    * rule as a pipeline stage): per connected component keep the member
    * with the highest integer lexical-richness score
    * (|distinct words|·1e6 + |words|; ties broken by lowest doc_id), so
    * the clean variant survives instead of whichever scrape happened to
    * get the lowest id. `canonical` is any (doc_id, canonical) frame
    * (q_dedup_canonical / [[canonicalStar]] output). Same id-keyed
    * join + per-cluster argmax volumes as the stats queries — no new
    * explode, no pair blowup. */
  def dropNearDupsBest(docs: DataFrame, canonical: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val scored = docs.select(col("doc_id"),
      (size(array_distinct(words)).cast("long") * 1000000L +
        size(words).cast("long")).as("_score"))
    val j = canonical.select("doc_id", "canonical").join(scored, "doc_id")
    // max over the UNIQUE (score, -doc_id) pair: deterministic argmax
    val best = j.groupBy(col("canonical"))
      .agg(max(struct(col("_score"), (-col("doc_id")).as("_nid"))).as("_m"))
      .select((-col("_m._nid")).as("doc_id"))
    docs.join(best, Seq("doc_id"), "left_semi")
  }

  /** Build the (doc_id, canonical, kept) frame from verified near-dup
    * pairs with the skew-resistant alternating-star CC
    * ([[graft.ops.Scale.starCC]]) — the 100 TB transitive-policy path
    * when a hub cluster would re-shuffle the propagation loop's hottest
    * key every round. Same output contract as q_dedup_canonical. */
  def canonicalStar(docs: DataFrame, nearPairs: DataFrame): DataFrame = {
    val labels = graft.ops.Scale.starCC(nearPairs, "da", "db")
      .withColumnRenamed("node", "doc_id")
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("canonical"),
        (col("doc_id") === coalesce(col("lbl"), col("doc_id")))
          .cast("long").as("kept"))
  }

  /** Full pipeline: returns per-stage counts and writes the surviving
    * corpus partitioned by lang. `nearPairs` comes from the verified
    * near-dup query (or any (da, db) pair frame). */
  def run(
      docs: DataFrame,
      nearPairs: DataFrame,
      sinkDir: String,
      minQuality: Double = 0.3,
      applyGopherRules: Boolean = false): Stats = {
    val input = docs.count()
    val scored = docs.filter(qualityScore(col("text")) >= minQuality)
    val q = if (applyGopherRules) scored.filter(gopherKeep(col("text"))) else scored
    val afterQuality = q.count()
    val e = dedupExact(q)
    val afterExact = e.count()
    val n = dropNearDups(e, nearPairs)
    val afterNear = n.count()
    n.write.partitionBy("lang").mode(SaveMode.Overwrite).parquet(sinkDir)
    Stats(input, afterQuality, afterExact, afterNear)
  }
}
