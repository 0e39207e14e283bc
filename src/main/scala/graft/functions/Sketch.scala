package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded cardinality-sketch aggregation for the sketch operators
  * (`graft.operators.Sketches`).
  */
object Sketch {

  /** K-Minimum-Values sketch buffer: the k smallest DISTINCT 64-bit
    * hash values in UNSIGNED order, as a typed [[Aggregator]].
    *
    * This is the scale shape that `count(DISTINCT key)` lacks: an
    * exact distinct shuffles every distinct key; this aggregator ships
    * at most k longs per map task (partial-aggregated, order- and
    * partition-independent because the buffer is a set with a total
    * order), so NDV estimation over a 100 TB column costs one scan +
    * a k-sized merge tree. Estimator and error bound are the standard
    * KMV ones (Bar-Yossef et al. 2002; relative σ ≈ 1/√(k−2)).
    *
    * Internal representation: hashes flipped by `^ Long.MinValue` so
    * SIGNED ascending order == unsigned ascending order of the raw
    * hash; `finish` un-flips, returning the k smallest raw hashes in
    * unsigned order — exactly what the DuckDB oracle's
    * `ORDER BY hugeint_hash LIMIT k` replays.
    */
  final class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    // buffer invariant: sorted ascending (flipped domain), distinct,
    // size ≤ k
    private def insert(buf: Seq[Long], raw: Long): Seq[Long] = {
      val v = raw ^ Long.MinValue
      if (buf.size >= k && v >= buf.last) buf
      else {
        val i = buf.indexWhere(x => x >= v)
        if (i >= 0 && buf(i) == v) buf // distinct: drop duplicate hash
        else {
          val w =
            if (i < 0) buf :+ v else (buf.take(i) :+ v) ++ buf.drop(i)
          if (w.size > k) w.take(k) else w
        }
      }
    }
    override def zero: Seq[Long] = Vector.empty
    override def reduce(buf: Seq[Long], h: Long): Seq[Long] = insert(buf, h)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      b.foldLeft(a)((acc, v) => insert(acc, v ^ Long.MinValue))
    override def finish(buf: Seq[Long]): Seq[Long] =
      buf.map(_ ^ Long.MinValue)
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
  }
}
