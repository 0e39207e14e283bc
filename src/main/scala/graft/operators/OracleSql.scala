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
  * Only valid for pure-ASCII text (DuckDB `ascii(char)` == JVM byte ==
  * JVM char) — true for the synthetic corpus; the JVM side hashes UTF-8
  * bytes, so a non-ASCII corpus would need a byte-level split instead.
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

  /** FNV-1a 64 over the chars of string expression `sExpr`, seed 0 —
    * mirrors [[TextHashes.hash64]] (ASCII: chars == UTF-8 bytes). */
  def fnv1a64(sExpr: String): String = {
    // constant start state: 0xcbf29ce484222325 ^ mix64(0)
    val h0 = java.lang.Long.toUnsignedString(
      0xcbf29ce484222325L ^ TextHashes.mix64(0L))
    val folded =
      s"""list_reduce(
         |  list_prepend(CAST($h0 AS HUGEINT),
         |    list_transform(string_split($sExpr, ''), c -> CAST(ascii(c) AS HUGEINT))),
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
