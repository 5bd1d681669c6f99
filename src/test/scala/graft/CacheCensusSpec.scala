package graft

/** CacheManager hygiene: a memoized family build must leave ONLY its
  * memo-owned entry cached — no orphaned scaffold persists. VERDICT r10
  * §wrong #1: docLogprobScores' plan-local `uni.persist()` was never
  * unpersisted, so one un-owned cached plan lingered in the
  * CacheManager per session. The census is a persistent-RDD delta on a
  * FRESH fixture dir (fresh (session, dir) memo key ⇒ the build really
  * runs rather than hitting the memo). */
class CacheCensusSpec extends SparkSpec {

  test("docLogprobScores build caches exactly its memo-owned entry — " +
    "no orphaned scaffold persist survives the build") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_census").toString
    // documents is the only table the lineage reads; round-trip through
    // spark so the fixture layout (dir-of-parquet-files) is preserved
    spark.read.parquet(s"$sf/documents.parquet")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    SparkEntry.queries("q_doc_logprob")(spark, tmp)
      .write.format("noop").mode("overwrite").save()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    val fresh = after -- before
    // exactly the memoized docLogprobScores entry: 1 cached RDD. The
    // pre-fix shape read 2 here (the orphaned uni scaffold).
    assert(fresh.size === 1,
      s"expected exactly the memo-owned cache entry, got ${fresh.size} " +
        s"new persistent RDDs (ids $fresh)")
  }
}
