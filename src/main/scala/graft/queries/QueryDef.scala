package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL
  * over the same parquet tables. `oracle = None` → the driver records a
  * weaker rows-only check; those queries get ScalaTest specs instead.
  *
  * Determinism contract (so result hashes match the oracle):
  *   - every query ends in a total ORDER BY (explicit null ordering:
  *     Spark ASC defaults nulls-first, DuckDB defaults nulls-last);
  *   - double aggregation casts *raw* columns to DECIMAL first (exact,
  *     order-independent sums in both engines), arithmetic happens in
  *     decimal, and only the final value is cast back to DOUBLE;
  *   - ratios divide decimal-exact operands as doubles (IEEE division
  *     of identical inputs is bit-identical across engines).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Q {
  def sql(name: String, oracle: String, doc: String = "")(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle), doc)

  def rowsOnly(name: String, doc: String = "")(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None, doc)
}
