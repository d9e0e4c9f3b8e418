package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic expression helpers.
  *
  * The correctness oracle re-runs every query in DuckDB and compares
  * value hashes, so floating-point aggregation order matters: a plain
  * `sum(double)` differs between Spark's partial/final aggregation tree
  * and DuckDB's sequential sum in the last bits. These helpers keep
  * results bit-identical across engines while staying native Catalyst
  * (and they are what you'd want at 100 TB anyway — decimal sums of
  * money-like columns don't accumulate fp error).
  */
object Parity {

  /** Exact sum of a fixed-point column: cast to decimal (exact), sum
    * (exact, order-independent), cast back to double (deterministic).
    * DuckDB equivalent: CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE).
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact-sum average; result is double in both engines.
    * DuckDB: CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x).
    */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)

  /** 60-bit deterministic string hash, identical in Spark and DuckDB:
    * Spark : conv(substring(md5(s),1,15),16,10)::long
    * DuckDB: ('0x' || substring(md5(s),1,15))::BIGINT
    * 15 hex digits < 2^60, so the value fits a signed 64-bit int.
    */
  def md5_60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant for hash families (MinHash, SimHash, LSH). */
  def md5_60Seeded(seed: Int, c: Column): Column =
    md5_60(concat(lit(seed.toString), lit(":"), c))

  /** Deterministic decimal rounding: floor(x·10^s + 0.5)/10^s — pure
    * IEEE double ops, so Spark and DuckDB produce bit-identical
    * results. Ties round toward +∞ (half-up for non-negatives).
    * Native `round()` is NOT cross-engine stable on doubles: Spark
    * rounds the exact binary value via BigDecimal while DuckDB rounds
    * the shortest decimal repr, and they disagree on values whose
    * shortest repr sits exactly on a tie (e.g. 61990.65).
    */
  def roundAt(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c * f + 0.5) / f
  }

  /** DuckDB text of [[roundAt]] for oracle SQL. */
  def roundAtSql(inner: String, scale: Int): String = {
    val f = math.pow(10, scale).toLong
    s"floor(($inner) * $f + 0.5) / $f"
  }

  /** Truncate-toward-negative-infinity double→long that both engines
    * agree on. NOTE: Spark CAST(double AS int) truncates toward zero
    * while DuckDB CAST rounds half-even — never cast a fractional
    * double directly; floor first.
    */
  def floorLong(c: Column): Column = floor(c).cast("long")
}
