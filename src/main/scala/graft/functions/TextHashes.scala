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
  def hash64(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ mix64(seed)
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
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

object GraftFunctions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.GraftColumnBridge

  def simhash64(c: Column): Column =
    GraftColumnBridge.column(SimHash64Expr(GraftColumnBridge.expression(c)))
  def rolling_hash64(c: Column): Column =
    GraftColumnBridge.column(RollingHash64Expr(GraftColumnBridge.expression(c)))

  /** Register SQL-callable versions (`SELECT simhash64(text) ...`). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash64", exprs => RollingHash64Expr(exprs.head), "scala_udf")
  }
}
