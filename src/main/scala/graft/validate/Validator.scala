package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.DatasetSpec

/** Range-rule violation counts for one column. */
final case class RangeViolation(column: String, belowMin: Long, aboveMax: Long)

/** Post-transform validation result — the engine mirror of the
  * reference's `_validate_schema` (src/ingestion/parser.py:77-115):
  * required-column presence, min/max range WARNING counts (violations
  * don't fail the pipeline, matching reference behavior), and
  * duplicate detection on the declared unique keys.
  */
final case class ValidationReport(
    rowCount: Long,
    missingRequired: Seq[String],
    rangeViolations: Seq[RangeViolation],
    duplicateKeyRows: Long) {
  def ok: Boolean = missingRequired.isEmpty && duplicateKeyRows == 0
}

object Validator {

  /** Validate a frame against its DatasetSpec.
    *
    * Scale shape: required-column presence is schema-only (no job);
    * row count + every range rule run in ONE aggregation pass
    * (map-side combinable conditional sums); the duplicate check is a
    * single groupBy on the unique keys. Two jobs total regardless of
    * how many rules the spec declares.
    */
  def validate(df: DataFrame, spec: DatasetSpec): ValidationReport = {
    val present = df.columns.toSet
    val missing = spec.requiredColumns.filterNot(present.contains)

    val ranged = spec.columns.filter(c =>
      present.contains(c.name) && (c.min.isDefined || c.max.isDefined))
    val aggs =
      count(lit(1)).as("__n") +:
        ranged.flatMap { c =>
          Seq(
            sum(when(c.min.map(m => col(c.name) < m).getOrElse(lit(false)), 1)
              .otherwise(0)).as(s"${c.name}__below"),
            sum(when(c.max.map(m => col(c.name) > m).getOrElse(lit(false)), 1)
              .otherwise(0)).as(s"${c.name}__above"))
        }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val rowCount = row.getLong(0)
    val violations = ranged.zipWithIndex.map { case (c, i) =>
      RangeViolation(c.name, row.getLong(1 + i * 2), row.getLong(2 + i * 2))
    }.filter(v => v.belowMin > 0 || v.aboveMax > 0)

    val dupRows =
      if (spec.validation.allowDuplicates || spec.validation.uniqueKeys.isEmpty ||
        !spec.validation.uniqueKeys.forall(present.contains)) 0L
      else {
        // rows participating in any duplicate group (pandas
        // duplicated(keep=False).sum() semantics, parser.py:107-113)
        val r = df.groupBy(spec.validation.uniqueKeys.map(col).toIndexedSeq: _*)
          .agg(count(lit(1)).as("__c"))
          .filter(col("__c") > 1)
          .agg(coalesce(sum(col("__c")), lit(0L)).as("dups"))
          .head()
        r.getLong(0)
      }

    ValidationReport(rowCount, missing, violations, dupRows)
  }
}
