package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S10 — SQL table scans. Two forms the reference uses
  * (storage.py:384-401 `pd.read_sql` over a SQLAlchemy engine):
  *
  *   - [[sql]]: run SQL against the engine's own registered tables
  *     (temp views over the warehouse) — fully offline-testable;
  *   - [[readTable]]: JDBC scan of an external database. At scale a
  *     single-connection JDBC read serializes the whole table through
  *     one executor, so the reader REQUIRES explicit partitioning
  *     options (partitionColumn/lowerBound/upperBound/numPartitions →
  *     one WHERE-range query per partition, parallel fetch). Untested
  *     live (no database in the zero-egress container); the option
  *     contract is unit-tested.
  */
object JdbcSource {

  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)

  /** Partitioned-read option map (the part worth testing). */
  def partitionedOptions(
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      fetchSize: Int = 1000): Map[String, String] = {
    require(numPartitions > 0 && upperBound > lowerBound,
      "JDBC partitioned read needs a non-empty bound range and >0 partitions")
    Map(
      "partitionColumn" -> partitionColumn,
      "lowerBound" -> lowerBound.toString,
      "upperBound" -> upperBound.toString,
      "numPartitions" -> numPartitions.toString,
      "fetchsize" -> fetchSize.toString)
  }

  def readTable(
      spark: SparkSession,
      url: String,
      table: String,
      properties: Properties,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int): DataFrame = {
    partitionedOptions(partitionColumn, lowerBound, upperBound, numPartitions)
      .foreach { case (k, v) => properties.setProperty(k, v) }
    spark.read.jdbc(url, table, properties)
  }
}
