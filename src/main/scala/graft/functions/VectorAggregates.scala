package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.9): element-wise vector mean as an
  * `Aggregator[IN, BUF, OUT]` — the centroid computation behind
  * q_vec_centroid expressed as a single typed aggregate instead of
  * posexplode + per-position rows.
  *
  * Scale: the buffer is one (count, Σ-vector) pair per group — merge is
  * element-wise add, so partial aggregation applies and the shuffle
  * carries |groups| × dim doubles, never raw vectors. Prefer this over
  * the posexplode formulation when dim is large (one row per group vs
  * dim rows per group through the exchange).
  */
object VectorAggregates {

  case class VecBuf(n: Long, sums: Array[Double])

  /** Mean of float-array embeddings (null-safe: null vectors skipped). */
  val vectorMean: Aggregator[Array[Float], VecBuf, Array[Double]] =
    new Aggregator[Array[Float], VecBuf, Array[Double]] {
      override def zero: VecBuf = VecBuf(0L, Array.empty)

      override def reduce(b: VecBuf, a: Array[Float]): VecBuf = {
        if (a == null) b
        else if (b.n == 0L) VecBuf(1L, a.map(_.toDouble))
        else {
          val s = b.sums.clone()
          var i = 0
          while (i < math.min(s.length, a.length)) { s(i) += a(i); i += 1 }
          VecBuf(b.n + 1, s)
        }
      }

      override def merge(x: VecBuf, y: VecBuf): VecBuf =
        if (x.n == 0L) y
        else if (y.n == 0L) x
        else {
          val s = x.sums.clone()
          var i = 0
          while (i < math.min(s.length, y.sums.length)) { s(i) += y.sums(i); i += 1 }
          VecBuf(x.n + y.n, s)
        }

      override def finish(b: VecBuf): Array[Double] =
        if (b.n == 0L) Array.empty else b.sums.map(_ / b.n)

      override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
      override def outputEncoder: Encoder[Array[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    }
}
