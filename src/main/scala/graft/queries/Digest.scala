package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-insensitive, engine-exact digest primitives.
  *
  * Motivation (round 8): the driver's oracle process accumulates every
  * query's materialized output; r7 lost 10 rows to host-memory OOM during
  * the check phase, densest at the alphabetical tail. Queries whose point
  * is a per-row transform over 10k-60k rows don't need to SHIP those rows
  * to prove correctness — they can ship a grouped digest whose value is a
  * deterministic function of every row, computed identically by Spark and
  * DuckDB. A single wrong row changes the digest, so the compare is as
  * strong as the full dump, at ~1/500 the transfer/materialization cost.
  *
  * Exactness rules:
  *  - strings: md5 is byte-identical across engines; a 10-hex-digit (40
  *    bit) prefix parsed as BIGINT sums without overflow up to ~8M rows
  *    (8e6 * 2^40 ≈ 8.8e18 < 2^63). Order-insensitive by summation.
  *  - doubles: only digested where the per-row double is already proven
  *    bit-identical across engines (r6 full-row hash match); fixing the
  *    point at a decimal grid (round(x*scale)) then summing BIGINTs is
  *    then order-independent and exact.
  *  - DuckDB widens SUM(BIGINT) to HUGEINT — every oracle-side digest sum
  *    must be CAST back to BIGINT (check.py type-lints this).
  */
object Digest {

  /** 40-bit BIGINT signature of a string column (null-safe: null → null,
    * which SUM skips on both engines — pair with a count(col) to pin the
    * null count). */
  def strSig(c: Column): Column =
    graft.functions.text.md5_prefix64(c.cast("string"), 10)

  /** DuckDB fragment computing the identical signature. NOTE: `||`, not
    * concat() — DuckDB's concat() treats NULL as '', yielding the
    * unparseable literal '0x' for null inputs; `||` propagates NULL so
    * the signature is null exactly when Spark's is. */
  def strSigSql(c: String): String =
    s"CAST('0x' || substring(md5(CAST($c AS VARCHAR)), 1, 10) AS BIGINT)"

  /** Fixed-point BIGINT signature of a numeric column at a decimal grid. */
  def numSig(c: Column, scale: Long): Column =
    round(c * scale, 0).cast("long")

  def numSigSql(c: String, scale: Long): String =
    s"CAST(round($c * $scale, 0) AS BIGINT)"
}
