package graft.operators

import graft.functions.TextHashes

/** DuckDB SQL snippet builders that recompute the engine-native 64-bit
  * hash family ([[graft.functions.TextHashes]]) from first principles,
  * so the "engine-defined" operators (rolling fingerprint, SimHash,
  * LSH bucketing) get REAL independent oracles instead of rows-only
  * checks or circular golden fixtures.
  *
  * Technique: unsigned 64-bit arithmetic emulated on DuckDB HUGEINT
  * (int128). A full 64×64-bit product overflows int128, so multiplies
  * are split into 32-bit halves:
  *   (a*b) mod 2^64 = ((hi32(a)*b mod 2^32) << 32 + lo32(a)*b) mod 2^64
  * xor/>> work natively on HUGEINT. Verified bit-exact against the JVM
  * implementation on the sf0.01 corpus (all three hash families).
  *
  * Alphabet scope: [[fnv1a64]] expands code points to UTF-8 bytes and
  * is exact on ANY text (r18). [[rollingHash]] folds per UTF-16 CODE
  * UNIT on the JVM (`charAt`) and per code point here, so it remains
  * exact only up to the BMP — true for the synthetic corpus, and the
  * rolling-fingerprint keys disclose that scope.
  */
object OracleSql {

  private val M64 = "18446744073709551616" // 2^64

  /** (a*b) mod 2^64 for HUGEINT a in [0,2^64) and constant b. */
  def mulmod(a: String, b: String): String =
    s"(((($a) >> 32) * ($b)) % 4294967296 * 4294967296 + (($a) % 4294967296) * ($b)) % $M64"

  /** splitmix64 finalizer — mirrors [[TextHashes.mix64]]. */
  def mix64(x: String): String = {
    val s1 = s"((($x) + 11400714819323198485) % $M64)"
    val s2 = s"(${mulmod(s"xor($s1, ($s1) >> 30)", "13787848793156543929")})"
    val s3 = s"(${mulmod(s"xor($s2, ($s2) >> 27)", "10723151780598845931")})"
    s"xor($s3, ($s3) >> 31)"
  }

  /** FNV-1a 64 over the UTF-8 BYTES of string expression `sExpr`,
    * seed 0 — mirrors [[TextHashes.hash64]] exactly on ANY alphabet
    * (review r18): each code point (DuckDB `ascii` returns the code
    * point for multibyte chars) expands to its 1–4 UTF-8 bytes by the
    * standard arithmetic before the fold, so non-ASCII text hashes
    * identically to the JVM's `getBytes(UTF_8)` fold — validated
    * bit-exact against the JVM on ASCII/Latin-1/CJK/astral samples.
    * The `c <> ''` filter guards the empty string (string_split('', '')
    * yields [''], which would fold a spurious zero byte). */
  def fnv1a64(sExpr: String): String = {
    // constant start state: 0xcbf29ce484222325 ^ mix64(0)
    val h0 = java.lang.Long.toUnsignedString(
      0xcbf29ce484222325L ^ TextHashes.mix64(0L))
    val utf8Bytes =
      s"""flatten(list_transform(
         |  list_filter(string_split($sExpr, ''), c -> c <> ''), c ->
         |  CASE WHEN ascii(c) < 128 THEN [ascii(c)]
         |    WHEN ascii(c) < 2048 THEN
         |      [192 + ascii(c) // 64, 128 + ascii(c) % 64]
         |    WHEN ascii(c) < 65536 THEN [224 + ascii(c) // 4096,
         |      128 + (ascii(c) // 64) % 64, 128 + ascii(c) % 64]
         |    ELSE [240 + ascii(c) // 262144,
         |      128 + (ascii(c) // 4096) % 64,
         |      128 + (ascii(c) // 64) % 64, 128 + ascii(c) % 64]
         |  END))""".stripMargin
    val folded =
      s"""list_reduce(
         |  list_prepend(CAST($h0 AS HUGEINT),
         |    list_transform($utf8Bytes, b -> CAST(b AS HUGEINT))),
         |  (acc, c) -> ${mulmod("xor(acc, c)", "1099511628211")})""".stripMargin
    mix64(folded)
  }

  /** Polynomial rolling hash (base 257 mod 2^64) + finalizer — mirrors
    * [[TextHashes.rollingHash]]. */
  def rollingHash(sExpr: String): String = {
    val folded =
      s"""list_reduce(
         |  list_prepend(CAST(0 AS HUGEINT),
         |    list_transform(string_split($sExpr, ''), c -> CAST(ascii(c) AS HUGEINT))),
         |  (acc, c) -> ((${mulmod("acc", "257")}) + c) % $M64)""".stripMargin
    mix64(folded)
  }

  /** Reinterpret a HUGEINT in [0,2^64) as signed 64-bit (JVM Long). */
  def toSigned(x: String): String =
    s"CAST(CASE WHEN ($x) >= 9223372036854775808 THEN ($x) - $M64 ELSE ($x) END AS BIGINT)"
}
