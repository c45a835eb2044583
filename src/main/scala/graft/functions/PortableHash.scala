package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * Spark's native `hash()` is 32-bit Murmur3 (seed 42) and `xxhash64` is
  * xxHash — neither is reproducible in a SQL oracle. MD5 is: both Spark
  * and ANSI-ish engines expose `md5(string) → hex`. We derive a 32-bit
  * integer hash from the first 8 hex chars, which keeps every downstream
  * computation (minhash permutations, simhash bit tests, bag
  * fingerprints) exactly reproducible in the DuckDB oracle via
  * `CAST(concat('0x', substr(md5(x),1,8)) AS BIGINT)`.
  *
  * All arithmetic stays in codegen'd Catalyst expressions — no UDFs.
  */
object PortableHash {

  /** Modulus for permutation hashing: largest common 30-bit-ish prime.
    * a*(h%P)+b stays < 2^61 — no 64-bit overflow in either engine. */
  val P: Long = 1000000007L

  /** First 8 hex chars of md5 as a long in [0, 2^32) — computed by the
    * native [[Md5Hash32]] expression (digest bytes → long directly; the
    * composed `conv(substring(md5(x),1,8),16,10)` form allocates a hex
    * string and radix-parses it per call, which dominated the
    * token-loop hot path). Same values, same oracle mirror. */
  def md5Hash32(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      Md5Hash32(org.apache.spark.sql.graftbridge.ColumnBridge.expression(
        c.cast("string"))))

  /** DuckDB mirror of [[md5Hash32]] — `x` is a SQL expression string. */
  def md5Hash32Sql(x: String): String =
    s"CAST(concat('0x', substr(md5($x), 1, 8)) AS BIGINT)"

  /** Deterministic minhash permutation coefficients (a_i, b_i), fixed for
    * the lifetime of the engine so signatures are stable across runs. */
  def coef(i: Int): (Long, Long) = {
    val a = (2654435761L * (i + 1)) % P
    val b = (40503L * 65537L * (i + 1) + 12345L) % P
    (if (a == 0) 1L else a, b)
  }

  /** h_i(token) = (a_i * (h mod P) + b_i) mod P over the md5-derived hash. */
  def permuted(h: Column, i: Int): Column = {
    val (a, b) = coef(i)
    (lit(a) * (h % lit(P)) + lit(b)) % lit(P)
  }

  /** DuckDB mirror of [[permuted]]. */
  def permutedSql(h: String, i: Int): String = {
    val (a, b) = coef(i)
    s"(($a * ($h % $P) + $b) % $P)"
  }
}
