package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Numeric determinism helpers for oracle-checked queries.
  *
  * Double sums are order-dependent (floating-point addition doesn't
  * associate), so a Spark sum and a DuckDB sum of the same doubles can
  * differ in the last bits and break the driver's hash compare. The
  * fix: cast *raw* monetary columns (2-decimal doubles, exactly
  * recoverable) to DECIMAL, do the arithmetic in decimal (exact,
  * order-independent in any engine), and cast only the final result to
  * DOUBLE. Ratios then divide decimal-exact operands in IEEE double,
  * which is bit-identical across engines for identical inputs.
  *
  * Casts are TRY_CAST on both sides: a non-representable value
  * (NaN/±Inf, or magnitude beyond the decimal width) becomes NULL and
  * drops out of SUM/AVG in both engines identically, instead of
  * aborting the job under ANSI mode. The excluded-value semantics are
  * part of the contract — monetary aggregates are over the
  * representable domain.
  */
object Num {
  /** Monetary columns: ≤ 10 integer digits, 2 decimals. */
  def dec(c: Column): Column = c.try_cast(DecimalType(12, 2))
  /** Small rates (discount/tax in [0,1]). */
  def rate(c: Column): Column = c.try_cast(DecimalType(4, 2))
  val oneD: Column = lit(1).cast(DecimalType(3, 2))

  /** Exact sum of a 2-decimal double column, returned as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
  /** Exact mean of a 2-decimal double column (decimal sum / count). */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(lit(1))

  /** Matching DuckDB SQL fragments. */
  def sqlDsum(col: String): String =
    s"CAST(SUM(TRY_CAST(CASE WHEN isnan($col) THEN NULL ELSE $col END AS DECIMAL(12,2))) AS DOUBLE)"
  def sqlDavg(col: String): String =
    s"CAST(SUM(TRY_CAST(CASE WHEN isnan($col) THEN NULL ELSE $col END AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)"
}
