package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a typed
  * `Aggregator` — sub-linear frequency estimation for heavy-hitter
  * detection when the exact (key, count) table is itself too large to
  * shuffle (corpus-scale token statistics, skew probes on raw keys).
  *
  * Shape: D=4 hash rows × W=512 counters of point increments; estimate
  * = min over rows (never under-counts; over-counts by at most εN with
  * ε = e/W at probability 1−e^−D — the classic guarantee). `merge` is
  * element-wise add, so partial aggregation applies: the shuffle
  * carries D·W longs per partition, NEVER the keys — at 100 TB this is
  * the difference between a 4 KB sketch per task and a billion-row
  * (key, count) exchange. Row hashes derive from one 64-bit input hash
  * by splitmix64 remixing with the row index (independent-enough rows,
  * deterministic everywhere — no engine hash in the loop, so the same
  * input hashes give the same sketch on any runtime).
  */
object Sketches {

  val D = 4
  val W = 512

  /** splitmix64 finalizer — decorrelates the D row hashes. */
  private[graft] def mix(h0: Long, row: Int): Int = {
    var z = h0 + 0x9e3779b97f4a7c15L * (row + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (((z % W) + W) % W).toInt
  }

  /** Estimate for a pre-hashed key from a finished sketch. */
  def estimate(sketch: Array[Long], h: Long): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < D) {
      val c = sketch(i * W + mix(h, i))
      if (c < best) best = c
      i += 1
    }
    best
  }

  case class CmsBuf(counts: Array[Long])

  /** Sketch of pre-hashed keys (feed it `xxhash64(key)` or any stable
    * 64-bit hash column). Buffer = flattened D×W counter matrix. */
  val countMin: Aggregator[Long, CmsBuf, Array[Long]] =
    new Aggregator[Long, CmsBuf, Array[Long]] {
      override def zero: CmsBuf = CmsBuf(Array.empty)

      override def reduce(b: CmsBuf, h: Long): CmsBuf = {
        val c = if (b.counts.length == D * W) b.counts else new Array[Long](D * W)
        var i = 0
        while (i < D) { c(i * W + mix(h, i)) += 1L; i += 1 }
        CmsBuf(c)
      }

      override def merge(x: CmsBuf, y: CmsBuf): CmsBuf =
        if (x.counts.isEmpty) y
        else if (y.counts.isEmpty) x
        else {
          val c = x.counts.clone()
          var i = 0
          while (i < c.length) { c(i) += y.counts(i); i += 1 }
          CmsBuf(c)
        }

      override def finish(b: CmsBuf): Array[Long] =
        if (b.counts.isEmpty) new Array[Long](D * W) else b.counts

      override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }
}
