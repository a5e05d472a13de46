package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, oracle-parity hashing helpers.
  *
  * Spark's `hash()`/`xxhash64()` are not reproducible in DuckDB, so every
  * operator that needs a content hash (dedup, minhash, simhash, bucketing)
  * uses an md5-derived 60-bit integer that both engines compute
  * identically:
  *   Spark : conv(substring(md5(x), 1, 15), 16, 10) :: long
  *   DuckDB: CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)
  *
  * 15 hex chars = 60 bits, so the value is always a non-negative BIGINT on
  * both sides. Mirrors the content-hash statement IDs of the reference
  * (nomenklatura `statement.py` id digests) without copying its scheme.
  */
object Hashing {

  /** 60-bit non-negative content hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL fragment equivalent to [[hash60]]. */
  def hash60Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  /** Mersenne prime 2^31-1 used as the universal-hash modulus. */
  val MinHashPrime: Long = 2147483647L

  /** i-th universal hash of a 60-bit hash column:
    * ((2i+1) * (h mod p) + (i*i + 7)) mod p.
    * Coefficients are small, so no 64-bit overflow: (2k+1)*p < 2^40.
    */
  def permute(h: Column, i: Int): Column = {
    val a = 2L * i + 1
    val b = i.toLong * i + 7
    ((h % MinHashPrime) * lit(a) + lit(b)) % MinHashPrime
  }

  /** DuckDB SQL fragment equivalent to [[permute]]. */
  def permuteSql(hExpr: String, i: Int): String = {
    val a = 2L * i + 1
    val b = i.toLong * i + 7
    s"((($hExpr) % ${MinHashPrime}) * $a + $b) % ${MinHashPrime}"
  }
}
