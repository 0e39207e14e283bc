package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit hashes used by the dedup/fingerprint operators.
  * Static methods so generated (whole-stage codegen) Java can call them
  * directly — the expressions below stay inside codegen instead of
  * falling back to interpreted eval.
  */
object TextHashes {

  /** splitmix64 finalizer — a strong, allocation-free 64-bit mixer. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes, mixed; `seed` derives independent hash
    * families (minhash permutations, LSH hyperplanes). */
  def hash64(s: String, seed: Long): Long =
    hash64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  /** Byte-array entry point: lets UTF8String callers hand over their
    * UTF-8 bytes directly (no UTF-16 decode + re-encode round trip in
    * the classifier's per-feature hot loop — review r18). */
  def hash64(bytes: Array[Byte], seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ mix64(seed)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** 64-bit SimHash over whitespace-token BIGRAMS: each bigram's hash
    * votes on every bit; the sign of the vote sum forms the
    * fingerprint. Bigrams (not unigrams) so corpora with a small shared
    * vocabulary still discriminate — near-dups share bigram
    * distributions, unrelated docs don't. */
  def simhash64(text: String): Long = {
    val votes = new Array[Int](64)
    var prev: String = null
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          val tok = text.substring(start, i)
          if (prev != null) {
            val h = hash64(prev + " " + tok, 0L)
            var b = 0
            while (b < 64) {
              if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
              b += 1
            }
          }
          prev = tok
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Codegen entry point (UTF8String in, long out). */
  def simhash64Utf8(s: UTF8String): Long = simhash64(s.toString)

  /** Polynomial rolling hash over the whole string (Rabin-Karp style,
    * base 257 mod 2^64) — the document-fingerprint primitive. */
  def rollingHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = h * 257L + s.charAt(i)
      i += 1
    }
    mix64(h)
  }

  def rollingHashUtf8(s: UTF8String): Long = rollingHash(s.toString)

  /** Codegen entry point for [[hash64]] at seed 0 (UTF8String in,
    * long out) — the feature-hash primitive of the hashed linear
    * classifier (and any future string-keyed hashing that needs the
    * DuckDB-replayable FNV family rather than xxhash64). UTF8String
    * already holds the UTF-8 bytes; hash them directly. */
  def fnv64Utf8(s: UTF8String): Long = hash64(s.getBytes, 0L)

  /** Codegen entry: deterministic permille-style bucket —
    * `remainderUnsigned(mix64(z), m)` — the membership primitive of
    * the sampling/mixing/decontamination filters. Unsigned remainder
    * (not pmod): the mixed value is a full 64-bit pattern and the
    * DuckDB oracles replay it as HUGEINT arithmetic. */
  def mix64Bucket(z: Long, m: Long): Long =
    java.lang.Long.remainderUnsigned(mix64(z), m)
}

/** Native Catalyst expression for [[TextHashes.simhash64]] — generated
  * code calls the static helper, so the projection stays inside
  * WholeStageCodegen (no interpreted fallback, no UDF serialization).
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"simhash64 needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    TextHashes.simhash64Utf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simhash64Utf8($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Native Catalyst expression for [[TextHashes.hash64]] at seed 0
  * (FNV-1a 64 + splitmix finalizer) — the string-feature hash the
  * DuckDB oracles replay via [[graft.operators.OracleSql.fnv1a64]]. */
case class Fnv1a64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"fnv1a64 needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    TextHashes.fnv64Utf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.fnv64Utf8($c)")
  override protected def withNewChildInternal(newChild: Expression): Fnv1a64Expr =
    copy(child = newChild)
  override def prettyName: String = "fnv1a64"
}

/** Native Catalyst expression for [[TextHashes.rollingHash]]. */
case class RollingHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextHashes.rollingHashUtf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.rollingHashUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash64"
}

/** Native Catalyst expression for [[TextHashes.mix64]] (splitmix64
  * finalizer, LONG → LONG) — lets the deterministic-sampling
  * membership filters run as codegen'd columnar predicates instead of
  * typed flatMap closures (no DeserializeToObject in the plan).
  */
case class Mix64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"mix64 needs BIGINT, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    TextHashes.mix64(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.mix64($c)")
  override protected def withNewChildInternal(newChild: Expression): Mix64Expr =
    copy(child = newChild)
  override def prettyName: String = "mix64"
}

/** `remainderUnsigned(mix64(child), modulus)` as one codegen'd call —
  * the exact semantics of the former per-row closures (unsigned
  * remainder over the full 64-bit mixed pattern). */
case class Mix64BucketExpr(child: Expression, modulus: Long)
    extends UnaryExpression {
  require(modulus > 0, "mix64_bucket modulus must be positive")
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"mix64_bucket needs BIGINT, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    TextHashes.mix64Bucket(v.asInstanceOf[Long], modulus)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.mix64Bucket($c, ${modulus}L)")
  override protected def withNewChildInternal(newChild: Expression): Mix64BucketExpr =
    copy(child = newChild)
  override def prettyName: String = "mix64_bucket"
}

object GraftFunctions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.GraftColumnBridge

  def simhash64(c: Column): Column =
    GraftColumnBridge.column(SimHash64Expr(GraftColumnBridge.expression(c)))
  def rolling_hash64(c: Column): Column =
    GraftColumnBridge.column(RollingHash64Expr(GraftColumnBridge.expression(c)))
  def fnv1a64(c: Column): Column =
    GraftColumnBridge.column(Fnv1a64Expr(GraftColumnBridge.expression(c)))
  def mix64(c: Column): Column =
    GraftColumnBridge.column(Mix64Expr(GraftColumnBridge.expression(c)))
  def mix64_bucket(c: Column, modulus: Long): Column =
    GraftColumnBridge.column(
      Mix64BucketExpr(GraftColumnBridge.expression(c), modulus))

  /** Register SQL-callable versions (`SELECT simhash64(text) ...`). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash64", exprs => RollingHash64Expr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mix64", exprs => Mix64Expr(exprs.head), "scala_udf")
  }
}
