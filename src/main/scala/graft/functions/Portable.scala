package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic primitives.
  *
  * The correctness gate cross-checks every query against DuckDB, so anything
  * pseudo-random or hash-based must compute the *same value* in both engines.
  * Spark's `hash`/`xxhash64` are Spark-specific; md5 is not: both engines
  * produce the same lowercase hex. All portable hashing therefore derives
  * from md5 hex.
  *
  * (Engine-internal code — the lake's bucketing, the generator — uses
  * `xxhash64`, which is faster and codegen'd; portability is only needed at
  * the oracle boundary.)
  */
object Portable {

  /** First 15 hex chars of md5 as a non-negative Long (60 bits, no overflow
    * under ANSI mode). DuckDB equivalent:
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`.
    *
    * Computed by the custom codegen'd [[Md5Long60]] expression — identical
    * values to `conv(substring(md5(c), 1, 15), 16, 10)::long` (spec-checked
    * against that composed form) without the per-row hex-string round trip.
    */
  def md5Long(c: Column): Column = Md5Long60.md5long60(c)

  /** The composed-builtin form of [[md5Long]] — kept as the reference
    * implementation the custom expression is verified against.
    */
  def md5LongReference(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Deterministic bucket in [0, n). DuckDB: `md5long(x) % n` (md5Long is
    * non-negative so % == pmod).
    */
  def bucket(c: Column, n: Int): Column = pmod(md5Long(c), lit(n.toLong))

  /** ±1 sign derived from a hash — the portable "random hyperplane" for
    * SimHash / LSH. DuckDB: `CASE WHEN md5long(x) % 2 = 0 THEN 1 ELSE -1 END`.
    */
  def hashSign(c: Column): Column =
    when(pmod(md5Long(c), lit(2L)) === 0, lit(1)).otherwise(lit(-1))
}
