package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine-exact aggregation helpers.
  *
  * The driver hash-compares Spark results against a DuckDB oracle
  * (BASELINE.md). A plain `SUM(double)` is order-dependent — a distributed
  * Spark sum and a DuckDB sum visit rows in different orders and can differ
  * in the last ulps, failing the hash. The fix used throughout this repo:
  *
  *   1. evaluate the per-row expression in IEEE double (deterministic and
  *      bit-identical in any engine for +,-,*,/),
  *   2. cast to DECIMAL(28,10) (a deterministic rounding of that double),
  *   3. SUM as decimal — exact integer arithmetic, associative, so any
  *      aggregation order (partial aggregates, shuffles, AQE re-plans)
  *      yields the same result,
  *   4. present as double.
  *
  * This also keeps the plan fully whole-stage-codegen'd (decimal sum is a
  * native Spark aggregate) and commutes with map-side partial aggregation,
  * so it costs nothing at scale relative to a double sum.
  */
object Exact {
  private val Dec = DecimalType(28, 10)

  /** Order-insensitive exact sum of a double expression, surfaced as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Exact average: exact decimal sum divided (in double) by the count. */
  def davg(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType) / count(c)

  /** DuckDB-SQL rendering of [[dsum]] for oracle queries.
    *
    * The double cast is routed through VARCHAR: DuckDB's direct
    * DECIMAL→DOUBLE cast divides in floating point (two roundings, can be
    * off by 1 ulp) while Spark's Decimal.toDouble is correctly rounded.
    * DECIMAL→VARCHAR is exact and VARCHAR→DOUBLE parsing is correctly
    * rounded, so the composition matches Spark bit-for-bit. */
  def sqlSum(e: String): String =
    s"CAST(CAST(SUM(CAST(($e) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)"

  /** DuckDB-SQL rendering of [[davg]]. */
  def sqlAvg(e: String): String =
    s"${sqlSum(e)} / COUNT($e)"

  /** DuckDB sums of integers widen to HUGEINT; pin back to BIGINT so the
    * oracle schema matches Spark's `sum(long) => long`.
    *
    * Audit rule (checked round 6 across every oracle in `graft.queries`):
    * any integer `SUM(...)` whose alias reaches the RESULT schema must go
    * through this helper (or an explicit `CAST(... AS BIGINT)`). HUGEINT is
    * fine in intermediate CTEs — only final output columns cross the
    * driver's arrow materialization, where int128 renders as decimal and
    * hash-diverges from Spark's long (the q82 round-5 failure). `COUNT`
    * needs no pin: DuckDB COUNT is already BIGINT. */
  def sqlSumLong(e: String): String = s"CAST(SUM($e) AS BIGINT)"
}
