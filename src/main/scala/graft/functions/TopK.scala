package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed [[Aggregator]] — the scale-safe
  * alternative to `row_number().over(Window)` top-n.
  *
  * Why this exists: a window top-n shuffles and sorts EVERY input row
  * on the partition key (at 100 TB, the full fact table moves through
  * one exchange and a per-partition sort). This aggregator instead
  * keeps a ≤ k buffer per group and participates in partial
  * aggregation: each map task ships at most k entries per group it
  * saw, so shuffle volume is O(k · groups · mapTasks) worst case and
  * O(k · groups) after map-side combine — independent of input rows.
  * The reduce/merge path is deterministic (total order below), so the
  * result is bit-stable under any partitioning.
  *
  * Ordering: best-first by (price DESC, key ASC) — `key` makes the
  * order total, which both pins ties and makes the DuckDB oracle's
  * `row_number() OVER (ORDER BY price DESC, key)` replay exact.
  */
object TopK {

  /** One candidate row: the ranking value and its tie-breaking id. */
  final case class Entry(price: Double, key: Long)

  /** `a` strictly outranks `b`. */
  private def outranks(a: Entry, b: Entry): Boolean =
    a.price > b.price || (a.price == b.price && a.key < b.key)

  /** One candidate with an integral rank (smallest-first variant) —
    * LONG, not Double: a 64-bit hash rank does not survive a Double
    * round-trip (53-bit mantissa), and the deterministic samplers rank
    * by exactly such hashes. Callers pre-flip the sign bit
    * (`h ^ Long.MinValue`) when unsigned order is wanted. */
  final case class LEntry(rank: Long, key: Long)

  private def lOutranks(a: LEntry, b: LEntry): Boolean =
    a.rank < b.rank || (a.rank == b.rank && a.key < b.key)

  /** Bounded per-group bottom-k by (rank ASC, key ASC) — identical
    * partial-aggregation scale shape to [[TopKAgg]]: ≤ k entries per
    * group per map task cross the shuffle, independent of input rows. */
  final class BottomKLongAgg(k: Int)
      extends Aggregator[LEntry, Seq[LEntry], Seq[LEntry]] {
    private def insert(buf: Seq[LEntry], e: LEntry): Seq[LEntry] = {
      if (buf.size >= k && !lOutranks(e, buf.last)) buf
      else {
        val i = buf.indexWhere(x => lOutranks(e, x))
        val w = if (i < 0) buf :+ e else (buf.take(i) :+ e) ++ buf.drop(i)
        if (w.size > k) w.take(k) else w
      }
    }
    override def zero: Seq[LEntry] = Vector.empty
    override def reduce(buf: Seq[LEntry], e: LEntry): Seq[LEntry] =
      insert(buf, e)
    override def merge(a: Seq[LEntry], b: Seq[LEntry]): Seq[LEntry] =
      b.foldLeft(a)(insert)
    override def finish(buf: Seq[LEntry]): Seq[LEntry] = buf
    override def bufferEncoder: Encoder[Seq[LEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[LEntry]]()
    override def outputEncoder: Encoder[Seq[LEntry]] = bufferEncoder
  }

  final class TopKAgg(k: Int)
      extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {

    // buffer invariant: best-first sorted, size ≤ k
    private def insert(buf: Seq[Entry], e: Entry): Seq[Entry] = {
      if (buf.size >= k && !outranks(e, buf.last)) buf
      else {
        val i = buf.indexWhere(x => outranks(e, x))
        val w = if (i < 0) buf :+ e else (buf.take(i) :+ e) ++ buf.drop(i)
        if (w.size > k) w.take(k) else w
      }
    }

    override def zero: Seq[Entry] = Vector.empty
    override def reduce(buf: Seq[Entry], e: Entry): Seq[Entry] =
      insert(buf, e)
    override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] =
      b.foldLeft(a)(insert)
    override def finish(buf: Seq[Entry]): Seq[Entry] = buf
    override def bufferEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] = bufferEncoder
  }
}
