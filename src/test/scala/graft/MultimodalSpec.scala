package graft

import graft.functions.Multimodal
import graft.functions.Multimodal._

/** Multimodal plumbing (SURVEY.md §2.9): schema, batch shape, and
  * determinism of the binary-column transforms. The codec kernels are
  * documented stubs; what's verified here is the Spark-side contract —
  * typed schemas, narrow per-partition execution, 1:N frame explode. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark, 30).cache()

  test("synthetic media is deterministic and header round-trips") {
    val a = media.collect().sortBy(_.media_id)
    val b = Multimodal.syntheticMedia(spark, 30).collect().sortBy(_.media_id)
    assert(a.map(_.payload.toSeq) === b.map(_.payload.toSeq))
    a.foreach { m =>
      assert(Codec.decodeHeader(m.payload) === ((m.width, m.height)))
    }
  }

  test("decode emits one typed row per payload with header-true dims") {
    val d = Multimodal.decode(media).collect()
    assert(d.length === 30)
    d.foreach { r =>
      assert(r.width >= 16 && r.height >= 9)
      assert(r.n_pixels > 0)
    }
    val schema = Multimodal.decode(media).schema
    assert(schema.fieldNames.toSeq ===
      Seq("media_id", "kind", "width", "height", "n_pixels", "checksum"))
  }

  test("resize halves dimensions and shrinks payloads, idempotent schema") {
    val r = Multimodal.resize(media, 2)
    val before = media.collect().map(m => m.media_id -> m).toMap
    r.collect().foreach { m =>
      val o = before(m.media_id)
      assert(m.width === math.max(o.width / 2, 1))
      assert(m.height === math.max(o.height / 2, 1))
      assert(m.payload.length < o.payload.length)
      // resized payload is itself decodable — transforms compose
      assert(Codec.decodeHeader(m.payload) === ((m.width, m.height)))
    }
  }

  test("frame sampling explodes only videos, every k-th frame") {
    val f = Multimodal.sampleFrames(media, frameBytes = 16, everyK = 2).collect()
    val videoIds = media.filter(_.kind == "video").collect().map(_.media_id).toSet
    assert(f.map(_.media_id).toSet === videoIds)
    f.groupBy(_.media_id).values.foreach { frames =>
      assert(frames.map(_.frame_no).forall(_ % 2 == 0))
    }
  }

  test("feature extraction yields fixed-dim embeddings joinable to VectorOps") {
    import org.apache.spark.sql.functions._
    val feats = Multimodal.features(media)
    assert(feats.schema("embedding").dataType.typeName === "array")
    val dims = feats.select(size(col("embedding"))).distinct().collect()
    assert(dims.length === 1 && dims(0).getInt(0) === 8)
  }

  test("end-to-end: media → features → cosine top-k via the native kernel") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the full multimodal similarity pipeline: decode-side features feed
    // the same top-k machinery as the embeddings fixture queries
    val feats = Multimodal.features(media)
    val q = feats.filter($"media_id" < 3)
      .select($"media_id".as("qid"), $"embedding".as("qv"))
    val scored = feats.select($"media_id".as("nid"), $"embedding".as("nv"))
      .join(broadcast(q), $"nid" =!= $"qid")
      .withColumn("cos",
        call_function("graft_dot", $"qv", $"nv") /
          (call_function("graft_l2norm", $"qv") * call_function("graft_l2norm", $"nv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"cos".desc, $"nid")
    val top = scored.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
    assert(top.count() === 9) // 3 queries × top-3
    top.select($"cos").as[Double].collect()
      .foreach(c => assert(c >= -1.0000001 && c <= 1.0000001))
  }

  test("pHash bands are 16-bit, deterministic, and the banded candidate " +
    "join is pigeonhole-complete below the band count") {
    val all = Multimodal.syntheticMedia(spark, 200).collect()
    val hashes = all.map(m => m.media_id -> Codec.phash(m.payload)).toMap
    hashes.values.foreach { bands =>
      assert(bands.length === 4)
      bands.foreach(b => assert(b >= 0 && b <= 0xffff))
    }
    // determinism: same payload → same hash
    all.foreach(m => assert(Codec.phash(m.payload).toSeq ===
      hashes(m.media_id).toSeq))
    // pigeonhole: any pair with Hamming ≤ 3 differs in at most 3 of the
    // 4 bands, so at least one band matches exactly → candidate found
    val ids = all.map(_.media_id).sorted
    for (a <- ids; b <- ids if a < b) {
      val (ha, hb) = (hashes(a), hashes(b))
      val ham = (0 until 4).map(i =>
        java.lang.Integer.bitCount(ha(i) ^ hb(i))).sum
      if (ham <= 3)
        assert((0 until 4).exists(i => ha(i) == hb(i)), s"pair ($a,$b)")
    }
  }

  test("q_media_phash_dup equals a driver brute-force of band-candidates " +
    "verified at Hamming ≤ 4") {
    import spark.implicits._
    val all = Multimodal.syntheticMedia(spark, 200).collect()
    val hashes = all.map(m => m.media_id -> Codec.phash(m.payload)).toMap
    val ids = all.map(_.media_id).sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      ha = hashes(a); hb = hashes(b)
      if (0 until 4).exists(i => ha(i) == hb(i))
      ham = (0 until 4).map(i =>
        java.lang.Integer.bitCount(ha(i) ^ hb(i))).sum.toLong
      if ham <= 4
    } yield (a, b, ham)).sorted
    val got = SparkEntry.all("q_media_phash_dup").fn(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
