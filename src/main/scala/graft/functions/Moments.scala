package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact fixed-point second-moment (Gram/covariance) accumulation over
  * an embedding column — the one-pass statistic PCA / whitening /
  * Mahalanobis pipelines need from a 100 TB corpus.
  *
  * Why fixed-point: a Double sum over shuffled rows is
  * order-dependent, so a float covariance can never hash-match an
  * oracle (the same reason the samplers rank by integer hashes and
  * vocab scoring sums quantized credits). Each row's contribution
  * `v_i · v_j` is quantized to a LONG (`floor(x·scale + 0.5)`, an
  * identical IEEE product+floor on any engine) BEFORE summation, and
  * long addition is exact and commutative — bit-stable under any
  * partitioning, with a documented quantization error bound of
  * n · 0.5/scale per entry.
  *
  * Scale shape: a typed Aggregator with a bounded d(d+1)/2+1-long
  * buffer (the trailing slot counts rows, so normalization needs NO
  * separate count() scan — the whole statistic is one pass); partial
  * aggregation ships ONE buffer per map task regardless of row count,
  * and the result is a single bounded array — the moment matrix never
  * materializes per-row anywhere (the explode-to-pairs formulation
  * would push d²/2 rows per document through the shuffle instead).
  */
final class MomentAgg(dim: Int, scale: Double)
    extends Aggregator[Array[Double], Array[Long], Array[Long]] {
  private val n = dim * (dim + 1) / 2 + 1 // + trailing row-count slot

  override def zero: Array[Long] = new Array[Long](n)

  override def reduce(buf: Array[Long], v: Array[Double]): Array[Long] = {
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        buf(k) += math.floor(v(i) * v(j) * scale + 0.5).toLong
        k += 1
        j += 1
      }
      i += 1
    }
    buf(n - 1) += 1L
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < n) { a(k) += b(k); k += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
}
