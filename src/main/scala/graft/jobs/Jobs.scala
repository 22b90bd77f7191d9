package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.DatasetSpec
import graft.queries.NycQueries
import graft.sink.{JsonFeatureSink, MetadataTable, UpsertSink}
import graft.validate.{ValidationReport, Validator}

/** The reference's two batch entry points as engine jobs.
  *
  * [[IngestJob]] = `python scripts/ingest_data.py --dataset <key>`
  * (SURVEY §3.1): fetch (caller supplies the raw frame via a
  * connector) → transform chain → validation → upsert-or-append →
  * parquet table → metadata bookkeeping. One lazy plan end-to-end
  * until the sink actions; per-dataset failures stay isolated in the
  * caller's loop like ingest_data.py:180-210.
  *
  * [[ExportJob]] = `python scripts/export_static_data.py` (§3.3): run
  * the three §2.6 queries and write each FeatureCollection to a static
  * JSON file.
  */
object IngestJob {

  final case class Result(
      datasetKey: String,
      tableDir: String,
      recordCount: Long,
      report: ValidationReport)

  /** Run one dataset's pipeline: transform → validate → upsert (on the
    * spec's unique keys; append when none declared — ingest_data.py:
    * 136-150) → metadata row. `dryRun` stops after validation
    * (ingest_data.py:108-116).
    */
  def run(
      spark: SparkSession,
      spec: DatasetSpec,
      raw: DataFrame,
      transform: DataFrame => DataFrame,
      warehouseDir: String,
      dryRun: Boolean = false): Result = {
    val transformed = transform(raw)
    val report = Validator.validate(transformed, spec)
    val tableDir = s"$warehouseDir/${spec.tableName}"
    if (!dryRun) {
      val keys = spec.validation.uniqueKeys
      if (keys.nonEmpty && keys.forall(transformed.columns.contains))
        UpsertSink.upsertParquet(spark, tableDir, transformed, keys,
          partitionBy = spec.partitionColumns)
      else {
        val w = transformed.write.mode("append")
        (if (spec.partitionColumns.nonEmpty)
          w.partitionBy(spec.partitionColumns: _*) else w).parquet(tableDir)
      }
      MetadataTable.update(spark, s"$warehouseDir/dataset_metadata",
        spec.datasetId, spec.tableName, report.rowCount)
    }
    Result(spec.key, tableDir, report.rowCount, report)
  }
}

object ExportJob {

  /** Run the three production queries over the warehouse tables and
    * write the three static FeatureCollection files
    * (export_static_data.py:118-151). Returns file → feature count.
    */
  def run(spark: SparkSession, warehouseDir: String, outDir: String): Map[String, Long] = {
    def table(name: String): DataFrame = spark.read.parquet(s"$warehouseDir/$name")
    val ntas = table("ntas_2020")
    val zctas = table("census_zctas_2020")
    val exports = Seq(
      ("food_gaps.json", NycQueries.foodGaps(ntas, table("food_supply_gaps"))),
      ("poverty_by_zip.json", NycQueries.povertyByZip(zctas, table("census_acs_income_poverty"))),
      ("rent_by_zip.json", NycQueries.rentByZip(zctas, table("zillow_zori"))))
    exports.map { case (file, features) =>
      val cached = features.cache()
      val n = cached.count()
      JsonFeatureSink.writeFeatureCollection(cached, s"$outDir/$file")
      cached.unpersist()
      file -> n
    }.toMap
  }
}
