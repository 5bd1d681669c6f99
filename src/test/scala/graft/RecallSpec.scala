package graft

import org.apache.spark.sql.functions._

/** Honest quality metrics for the approximate retrieval paths on the
  * fixed sf0.001 corpus (constants are stable because the data is
  * seeded):
  *  - LSH candidate generation catches 100% of true Jaccard≥0.2 pairs
  *    (28/28) while proposing only ~910 of 124,750 possible pairs;
  *  - hyperplane-LSH bucketed top-3 recall vs brute force is ~0.43
 *    (single-table AND-construction; see the test for why);
 *  - IVF 2-probe top-3 recall vs brute force is ~0.42 — expected on
  *    UNCLUSTERED near-uniform random vectors (true neighbors scatter
  *    across cells); on real clustered embeddings cell locality is what
  *    makes IVF work. The brute-force path stays the verified baseline.
  */
class RecallSpec extends SparkSpec {

  test("LSH candidates cover every true Jaccard>=0.2 pair") {
    import spark.implicits._
    val docs = graft.util.Tables.documents(spark, sf)
    val K = 3
    val sets = docs
      .select($"doc_id", split($"text", " ").as("w"))
      .select($"doc_id", array_distinct(transform(
        sequence(lit(1), greatest(size($"w") - (K - 1), lit(1))),
        i => concat_ws(" ", element_at($"w", i), element_at($"w", i + 1),
          element_at($"w", i + 2)))).as("ss"))
    val a = sets.select($"doc_id".as("da"), $"ss".as("sa"))
    val b = sets.select($"doc_id".as("db"), $"ss".as("sb"))
    val truePairs = a.join(b, $"da" < $"db")
      .withColumn("inter", size(array_intersect($"sa", $"sb")).cast("double"))
      .withColumn("jac", $"inter" /
        ((size($"sa") + size($"sb")).cast("double") - $"inter"))
      .filter($"jac" >= 0.2)
      .select($"da", $"db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candidates = SparkEntry.all("q_dedup_lsh").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.nonEmpty)
    assert((truePairs -- candidates).isEmpty,
      s"missed ${(truePairs -- candidates).size} of ${truePairs.size} true pairs")
    // and it actually prunes: far fewer candidates than all pairs
    val n = docs.count()
    assert(candidates.size < n * (n - 1) / 2 / 10)
  }

  test("hyperplane-LSH bucketed top-3 recall vs brute force") {
    // measured 0.433 on seed=42 — on this near-1-D corpus most mass
    // lands in two sign-complement buckets, and the loss comes from true
    // neighbors sitting one flipped plane-bit away (the classic single-
    // table LSH failure mode; multi-table OR-construction is the fix at
    // scale). Floor well below measured so the pin is about regressions.
    val bf = SparkEntry.all("q_sim_topk").fn(spark, sf)
      .filter(col("rk") <= 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lsh = SparkEntry.all("q_sim_lsh").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = bf.map { case (q, t) =>
      t.intersect(lsh.getOrElse(q, Set.empty)).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.35, s"mean recall $mean")
  }

  test("two-stage q_dedup_embed: precision 1 vs brute force, recall above floor") {
    import spark.implicits._
    // brute-force ground truth: ALL pairs with cos >= 0.35 (test-only
    // O(n²) — exactly the plan the production query must never run)
    val b0 = graft.util.Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nm", sqrt(aggregate($"v", lit(0.0), (acc, x) => acc + x * x)))
    val a = b0.select($"vec_id".as("ida"), $"v".as("va"), $"nm".as("na"))
    val b = b0.select($"vec_id".as("idb"), $"v".as("vb"), $"nm".as("nb"))
    val brute = a.join(b, $"ida" < $"idb")
      .withColumn("cos",
        aggregate(zip_with($"va", $"vb", (x, y) => x * y), lit(0.0),
          (acc, x) => acc + x) / ($"na" * $"nb"))
      .filter($"cos" >= 0.35)
      .select($"ida", $"idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val staged = SparkEntry.all("q_dedup_embed").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    // every emitted pair is a true >=0.35 pair (verify stage is exact)
    assert((staged -- brute).isEmpty, s"false positives: ${(staged -- brute).size}")
    // recall floor: measured 0.65 at sf0.001 / 0.73 at sf0.01 — partial
    // BY CONSTRUCTION on this isotropic-noise corpus (0.35 is in the
    // random-similarity tail, where no sublinear candidate scheme is
    // complete); the pin is about regressions, not completeness
    val recall = staged.size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall (${staged.size}/${brute.size})")
  }

  test("PQ-ADC top-10 recall vs exact L2 top-10 stays above floor") {
    import spark.implicits._
    // exact L2 ground truth driver-side (test-only brute force)
    val emb = graft.util.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val truth = (0L until 10L).map { qid =>
      qid -> emb.keys.filter(_ != qid).toSeq
        .map(nid => (d2(emb(qid), emb(nid)), nid)).sorted.take(10)
        .map(_._2).toSet
    }.toMap
    val adc = SparkEntry.all("q_pq_adc").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = truth.map { case (q, t) =>
      t.intersect(adc.getOrElse(q, Set.empty)).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    // K=8 centroids/subspace is a coarse 3-bit code on isotropic noise
    // — the floor pins regressions, not completeness (real embedding
    // corpora train the codebook and use K=256)
    assert(mean >= 0.25, s"mean ADC recall@10 $mean")
  }

  test("IVF-PQ top-5 recall vs exact L2 top-5 stays above the composed floor") {
    import spark.implicits._
    val emb = graft.util.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val truth = (10L until 30L).map { qid =>
      qid -> emb.keys.filter(_ != qid).toSeq
        .map(nid => (d2(emb(qid), emb(nid)), nid)).sorted.take(5)
        .map(_._2).toSet
    }.toMap
    val got = SparkEntry.all("q_ivfpq").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = truth.map { case (q, t) =>
      t.intersect(got.getOrElse(q, Set.empty)).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    // composed loss: 2-of-10 probed cells × 3-bit ADC code on isotropic
    // noise — the floor pins regressions, not absolute quality
    assert(mean >= 0.1, s"mean IVF-PQ recall@5 $mean")
  }

  test("IVF 2-probe top-3 recall vs brute force stays above the random-data floor") {
    val bf = SparkEntry.all("q_sim_topk").fn(spark, sf)
      .filter(col("qid") >= 10 && col("qid") < 30 && col("rk") <= 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = SparkEntry.all("q_sim_ivf").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = bf.map { case (q, t) =>
      t.intersect(ivf.getOrElse(q, Set.empty)).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean recall $mean") // measured 0.417 on seed=42
  }
}
