package graft

import org.apache.spark.sql.graftshim.Shim

/** The kernel-or-builtin switches (VectorOps.base, TextDedup, TextOps,
  * q_text_fingerprint) must produce identical results when the graft
  * functions are NOT registered — the driver's smoke path and any plain
  * session depend on the fallback wiring actually working. */
class FallbackSpec extends SparkSpec {

  private val kernels = Seq("graft_dot", "graft_l2norm", "graft_fp",
    "graft_shingle_hash", "graft_shingle_hashes", "graft_ngrams",
    "graft_intersect_card", "graft_chargram_hashes", "graft_window_hashes",
    "graft_char3grams")
  private val affected = Seq("q_sim_topk", "q_dedup_embed", "q_vec_centroid",
    "q_lang_id", "q_text_fingerprint", "q_dedup_near", "q_dedup_minhash",
    "q_dedup_ngram", "q_dedup_canonical", "q_contamination",
    "q_dedup_substring")

  test("fallback builders == kernel builders for every kernel-aware query") {
    val withKernels = affected.map(n =>
      n -> SparkEntry.all(n).fn(spark, sf).collect()).toMap
    kernels.foreach(Shim.dropFunction(spark, _))
    try {
      affected.foreach { n =>
        assert(!spark.catalog.functionExists("graft_dot"))
        val fallback = SparkEntry.all(n).fn(spark, sf).collect()
        val expected = withKernels(n)
        assert(fallback.length === expected.length, s"$n row count")
        fallback.zip(expected).zipWithIndex.foreach { case ((f, e), i) =>
          assert(f === e, s"$n row $i")
        }
      }
    } finally {
      // re-register for later suites (same builders as GraftExtensions)
      Reregister.register(spark)
      assert(spark.catalog.functionExists("graft_dot"))
    }
  }
}

/** Re-registers the graft functions on an existing session (mirrors
  * GraftExtensions.injectFunction, which only applies at session build). */
object Reregister {
  import org.apache.spark.sql.SparkSession
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions._
    import graft.functions._
    val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
      "graft_dot" -> (c => DotProduct(c(0), c(1))),
      "graft_l2norm" -> (c => L2Norm(c.head)),
      "graft_fp" -> (c => RollingHash(c.head)),
      "graft_shingle_hash" -> (c => ShingleHash(c.head)),
      "graft_ngrams" -> (c => CharNGrams(c(0), c(1))),
      "graft_intersect_card" -> (c => ArrayIntersectCard(c(0), c(1))),
      "graft_shingle_hashes" -> (c => WordShingleHashes(c.head)),
      "graft_chargram_hashes" -> (c => CharGramHashes(c.head)),
      "graft_window_hashes" -> (c => WindowGramHashes(c.head)),
      "graft_char3grams" -> (c => CharTrigrams(c.head)))
    fns.foreach { case (name, builder) =>
      org.apache.spark.sql.graftshim.Shim.registerFunction(spark, name, builder)
    }
  }
}
