package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.9; BASELINE.json north_star): media
  * payloads travel as opaque `binary` columns with typed metadata, and
  * decode / resize / frame-sample / feature-extract run as batched
  * per-partition transforms (`mapPartitions` over typed Datasets — the
  * Scala analog of arrow-batched python UDFs: one iterator per
  * partition, rows streamed, never materialized whole).
  *
  * ── STUB BOUNDARY ─────────────────────────────────────────────────
  * No image/audio codec library exists in this container, so the codec
  * kernels below ([[Codec.decodeHeader]], [[Codec.resizePixels]],
  * [[Codec.frames]], [[Codec.embed]]) are DETERMINISTIC FAKES operating
  * on a self-describing synthetic payload layout. Swapping in a real
  * codec changes ONLY the Codec object; every schema, partition shape,
  * and operator signature stays as-is.
  * ──────────────────────────────────────────────────────────────────
  *
  * Scale notes (100 TB of media):
  *  - payloads never pass through a shuffle: decode/resize/embed are
  *    narrow per-partition maps; only small derived columns (meta,
  *    embeddings) ever shuffle;
  *  - `spark.sql.files.maxPartitionBytes` sizes partitions so one batch
  *    of payloads fits executor memory;
  *  - joins against media metadata broadcast the metadata side.
  */
object Multimodal {

  case class Media(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int)
  case class Decoded(media_id: Long, kind: String, width: Int, height: Int,
      n_pixels: Long, checksum: Long)
  case class Frame(media_id: Long, frame_no: Int, offset: Int, checksum: Long)

  /** Deterministic fake codec — the swap-in point for a real library. */
  object Codec {
    /** Payload layout: [w_hi, w_lo, h_hi, h_lo, body...] — a fake
      * "header parse". A real decoder would return the codec's header. */
    def decodeHeader(p: Array[Byte]): (Int, Int) =
      (((p(0) & 0xff) << 8) | (p(1) & 0xff), ((p(2) & 0xff) << 8) | (p(3) & 0xff))

    /** Fake resize: subsample every `factor`-th body byte. */
    def resizePixels(p: Array[Byte], factor: Int): Array[Byte] =
      p.drop(4).zipWithIndex.collect { case (b, i) if i % factor == 0 => b }

    /** Fake frame split: fixed-size chunks of the body. */
    def frames(p: Array[Byte], frameBytes: Int): Iterator[Array[Byte]] =
      p.drop(4).grouped(frameBytes)

    /** Fake feature extraction: 8-dim rolling-hash embedding. */
    def embed(p: Array[Byte], dim: Int = 8): Array[Float] = {
      val acc = new Array[Long](dim)
      var i = 0
      while (i < p.length) { acc(i % dim) = acc(i % dim) * 31 + (p(i) & 0xff); i += 1 }
      acc.map(v => (v % 1000003L).toFloat / 1000003f)
    }

    def checksum(p: Array[Byte]): Long =
      p.foldLeft(0L)((a, b) => a * 131 + (b & 0xff))

    /** Fake perceptual hash — the block-mean pHash shape on the stub
      * payload: fold bytes into 64 positional buckets (bucket k =
      * Σ bytes at positions ≡ k mod 64), set bit k iff its bucket sum
      * exceeds the global mean (integer-exact: s_k·64 > total), and
      * emit the 64 bits as four 16-bit band values — the banded form
      * the Hamming-LSH candidate join keys on directly. A real pHash
      * (DCT block means) swaps in here without touching the bands. */
    def phash(p: Array[Byte]): Array[Int] = {
      val sums = new Array[Long](64)
      var tot = 0L
      var i = 0
      while (i < p.length) {
        val v = (p(i) & 0xff).toLong
        sums(i % 64) += v; tot += v; i += 1
      }
      val bands = new Array[Int](4)
      var k = 0
      while (k < 64) {
        if (sums(k) * 64 > tot) bands(k / 16) |= 1 << (k % 16)
        k += 1
      }
      bands
    }
  }

  /** Deterministic synthetic media table (no external fixtures exist for
    * binary payloads): payload body is a seeded byte pattern, header
    * encodes the dimensions so decode is verifiable. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[Media] = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val kinds = Seq("image", "audio", "video")
      val kind = kinds((id % 3).toInt)
      val w = 16 + (id % 8).toInt * 4
      val h = 9 + (id % 5).toInt * 3
      val body = Array.tabulate(64 + (id % 32).toInt * 4)(i =>
        ((id * 131 + i * 7) % 251).toByte)
      val payload = Array[Byte](
        ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
        ((h >> 8) & 0xff).toByte, (h & 0xff).toByte) ++ body
      Media(id, kind, payload, w, h, if (kind == "audio") 16000 else 0)
    }
  }

  /** Batched decode: one partition = one batch; payload bytes stay
    * executor-local (narrow — no shuffle). */
  def decode(media: Dataset[Media]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val (w, h) = Codec.decodeHeader(m.payload)
        Decoded(m.media_id, m.kind, w, h,
          (m.payload.length - 4).toLong, Codec.checksum(m.payload))
      }
    }
  }

  /** Fake resize keeping the Media shape (header rewritten to the new
    * dims) — chained transforms stay narrow. */
  def resize(media: Dataset[Media], factor: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val (w, h) = Codec.decodeHeader(m.payload)
        val (nw, nh) = (math.max(w / factor, 1), math.max(h / factor, 1))
        val body = Codec.resizePixels(m.payload, factor)
        val payload = Array[Byte](
          ((nw >> 8) & 0xff).toByte, (nw & 0xff).toByte,
          ((nh >> 8) & 0xff).toByte, (nh & 0xff).toByte) ++ body
        m.copy(payload = payload, width = nw, height = nh)
      }
    }
  }

  /** Frame sampling (video): explode each payload into every `everyK`-th
    * frame — one-to-many, still narrow; only the small Frame rows flow on. */
  def sampleFrames(media: Dataset[Media], frameBytes: Int, everyK: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { batch =>
      batch.flatMap { m =>
        Codec.frames(m.payload, frameBytes).zipWithIndex.collect {
          case (f, i) if i % everyK == 0 =>
            Frame(m.media_id, i, 4 + i * frameBytes, Codec.checksum(f))
        }
      }
    }
  }

  /** Perceptual-hash bands → (media_id, band, bv): one row per 16-bit
    * band, the exploded form the Hamming-LSH candidate join consumes.
    * Narrow per-partition map — payloads never shuffle; only the four
    * small band rows per item flow on. */
  def phashBands(media: Dataset[Media]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        val bands = Codec.phash(m.payload)
        (0 until 4).iterator.map(b => (m.media_id, b.toLong, bands(b).toLong))
      }
    }.toDF("media_id", "band", "bv")
  }

  /** Feature extraction → (media_id, embedding) — the bridge into the
    * VectorOps similarity inventory. */
  def features(media: Dataset[Media]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map(m => (m.media_id, Codec.embed(m.payload)))
    }.toDF("media_id", "embedding")
  }
}
