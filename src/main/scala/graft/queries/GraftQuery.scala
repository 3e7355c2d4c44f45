package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over the
  * same parquet tables. Column names are aliased identically on both sides —
  * the driver's compare sorts columns by name before hashing.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  /** DuckDB reads tables as `name` — the driver registers each parquet as a
    * view named after the table, so oracle SQL references bare table names.
    */
  def q(name: String, sql: String)(run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, Some(sql))

  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, None)
}

/** Bit-exact float handling shared by Spark plans and DuckDB oracles.
  *
  * Summing doubles is order-dependent, and `round()` itself disagrees between
  * engines on .xx5 boundaries (Spark rounds the shortest decimal repr
  * HALF_UP; DuckDB rounds the binary value). The testdata's money/value
  * columns live on a fixed decimal grid, so the robust pattern is: scale each
  * ROW to an exact integer (round-to-nearest is safe — the value is within
  * ~1e-9 of the grid point, the boundary is at 0.5), then SUM the integers.
  * Integer sums are exact and order-independent → identical on both engines.
  */
object Exact {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{round => sqlRound, sum, floor}

  /** Per-row decimal→integer scaling, e.g. dollars→cents (scale=100).
    * floor(x·s + 0.5) == round-half-up for values ~1e-9 off the integer grid,
    * positive or negative — and unlike Spark's `round()` (BigDecimal per row)
    * it stays pure arithmetic inside whole-stage codegen.
    */
  def asInt(c: Column, scale: Long): Column = floor(c * scale + 0.5).cast("long")

  /** Exact integer sum of a decimal-grid column. */
  def sumScaled(c: Column, scale: Long): Column = sum(asInt(c, scale))

  /** DuckDB types sum(BIGINT) as HUGEINT, which pandas renders as float64 —
    * the outer CAST keeps the oracle column int64 so it hash-matches Spark.
    */
  def sumScaledSql(e: String, scale: Long): String =
    s"CAST(sum(CAST(round(($e) * $scale) AS BIGINT)) AS BIGINT)"

  /** Quantize an already-bit-identical double (cosines, norms) to an integer
    * grid with floor — floor on identical bits is identical on both engines.
    */
  def quant(c: Column, scale: Long): Column = floor(c * scale + 0.5).cast("long")

  def quantSql(e: String, scale: Long): String =
    s"CAST(floor(($e) * $scale + 0.5) AS BIGINT)"
}
