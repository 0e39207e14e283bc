package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter runtime filtering: a bounded bit-set membership sketch
  * built with one scan + OR-merge, probed by a codegen'd scalar
  * predicate. This is the explicit, engine-owned version of what
  * Spark's `InjectRuntimeFilter` rule does opportunistically — made a
  * first-class operator so the pruning is guaranteed (not
  * heuristic-gated), deterministic (splitmix64 double-hashing, no RNG)
  * and measurable.
  *
  * Sizing: the filter is a FIXED `mBits` bit array (`mBits/64` longs).
  * Per-task partial state is one such array regardless of input size
  * and the merge tree ORs them, so the build costs one scan + a
  * constant-size shuffle. The driver collect and executor broadcast
  * are `mBits/8` bytes (128 KB at the default 2^20) — flat in data
  * size. That holds while the keyed side stays under ~10^9 keys (scale
  * m with n for a target false-positive rate: m ≈ 1.44·k·n bits);
  * beyond that a single broadcast bloom outgrows its usefulness and
  * the production layout shards the filter by key prefix next to a
  * bucketed digest store ([[graft.operators.Incremental]] keeps that
  * exact-layer store shape).
  *
  * False positives only enlarge the candidate set — every use in this
  * repo re-verifies candidates with the exact join/predicate, so the
  * bloom is a LOSSLESS prefilter (no false negatives by construction:
  * every inserted key's k bits are set) and the query result equals
  * the un-bloomed plan's result bit-for-bit.
  */
object Bloom {

  /** Default filter size: 2^20 bits = 16 K longs = 128 KB. */
  val M_BITS: Int = 1 << 20

  /** Probes per key; with n ≤ 100k keys at 2^20 bits the FP rate is
    * (1 − e^(−kn/m))^k ≤ 3e−6. */
  val K: Int = 5

  /** Probe j of pre-hashed value `hv`: remainderUnsigned(mix64(hv+j), m).
    * Double-hash-free (full re-mix per probe) keeps probes pairwise
    * independent and replayable from first principles. */
  @inline def bitFor(hv: Long, j: Int, mBits: Long): Long =
    java.lang.Long.remainderUnsigned(TextHashes.mix64(hv + j), mBits)

  /** Static codegen entry: all k probe bits set? */
  def mightContain(words: Array[Long], hv: Long, k: Int): Boolean = {
    val mBits = words.length.toLong * 64L
    var j = 0
    while (j < k) {
      val b = bitFor(hv, j, mBits)
      if ((words((b >>> 6).toInt) & (1L << (b & 63L))) == 0L) return false
      j += 1
    }
    true
  }

  /** Set the k probe bits of `hv` in `words` (in place — Aggregator
    * buffers are single-owner between serializations). */
  def add(words: Array[Long], hv: Long, k: Int): Array[Long] = {
    val mBits = words.length.toLong * 64L
    var j = 0
    while (j < k) {
      val b = bitFor(hv, j, mBits)
      words((b >>> 6).toInt) |= (1L << (b & 63L))
      j += 1
    }
    words
  }

  /** Build a bloom over pre-hashed LONG values. Partial state is one
    * fixed `mBits/64`-long array per task; merge is bitwise OR —
    * commutative, associative, partition-order independent. */
  final class BloomAgg(mBits: Int, k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(mBits % 64 == 0 && mBits > 0, "mBits must be a positive x64")
    override def zero: Array[Long] = new Array[Long](mBits / 64)
    override def reduce(buf: Array[Long], hv: Long): Array[Long] =
      add(buf, hv, k)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
  }

  /** Column helper: membership probe of a pre-hashed LONG column
    * against a built filter. The words array rides into generated code
    * as a referenced object (one per plan, not per row). */
  def mightContainCol(hashed: Column, words: Array[Long],
      k: Int = K): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(BloomMightContainExpr(
      GraftColumnBridge.expression(hashed), words, k))
  }
}

/** Native Catalyst expression for [[Bloom.mightContain]] — the probe
  * stays inside WholeStageCodegen, so bloom-pruning a 100 TB scan adds
  * a branch per row, not a UDF call per row. */
case class BloomMightContainExpr(
    child: Expression, words: Array[Long], k: Int)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"bloom_might_contain needs BIGINT, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    Bloom.mightContain(words, v.asInstanceOf[Long], k)
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Bloom.mightContain($ref, $c, $k)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainExpr = copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}
