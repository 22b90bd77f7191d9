package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_events_value_histogram: exact bucket boundaries
  * (negatives floor down, 9.99 vs 10 split) and corpus mass
  * conservation.
  */
class ValueHistogramSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val plantedDir: String = {
    val rows = Seq(
      (0L, 0L, 1L, "A", -5.0, "{}"),
      (1L, 1L, 1L, "A", 3.0, "{}"),
      (2L, 2L, 1L, "A", 9.99, "{}"),
      (3L, 3L, 1L, "A", 10.0, "{}"),
      (4L, 4L, 1L, "B", 95.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("vhist_fix").toString
    rows.toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("planted values: floor boundaries exact, negatives floor down") {
    val out = SparkEntry.queries("q_events_value_histogram")(spark, plantedDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("A", -1L) -> 1L, ("A", 0L) -> 2L, ("A", 1L) -> 1L, ("B", 9L) -> 1L))
  }

  test("corpus run: bucket mass equals the non-NaN event count") {
    val rows = SparkEntry.queries("q_events_value_histogram")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val expected = graft.sources.Tables.events(spark, sfDir)
      .filter(!isnan(col("value"))).count()
    assert(rows.map(_.getLong(2)).sum == expected)
  }
}
