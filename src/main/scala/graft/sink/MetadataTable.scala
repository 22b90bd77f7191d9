package graft.sink

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** K5 — per-dataset ingestion bookkeeping (storage.py:299-334): one row
  * per dataset_id holding last ingestion time, record count, status —
  * upserted on dataset_id via the latest-wins Parquet strategy.
  */
object MetadataTable {

  final case class MetadataEntry(
      dataset_id: String,
      table_name: String,
      last_ingestion: Timestamp,
      record_count: Long,
      status: String)

  /** Record (or overwrite) the bookkeeping row for one ingestion run. */
  def update(
      spark: SparkSession,
      dir: String,
      datasetId: String,
      tableName: String,
      recordCount: Long,
      status: String = "success",
      now: Timestamp = new Timestamp(System.currentTimeMillis())): Unit = {
    import spark.implicits._
    val entry = Seq(
      MetadataEntry(datasetId, tableName, now, recordCount, status)).toDF()
    UpsertSink.upsertParquet(spark, dir, entry, keys = Seq("dataset_id"))
  }

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
