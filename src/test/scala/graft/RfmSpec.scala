package graft

import org.apache.spark.sql.functions._

/** Ground truth for q3_shipping_priority and q_events_rfm: planted
  * fixtures with hand-computed results, plus plan/invariant checks.
  */
class RfmSpec extends SparkSpecBase {
  import spark.implicits._

  /** Horizon day 100. User 1: events on days 98,100 (recency 0, f 2,
    * value 10.50+2.25); user 2: day 90 (recency 10, warm), 1 event;
    * user 3: day 10 (dormant), 12 events of 1.00 (medium).
    */
  private lazy val rfmDir: String = {
    val rows =
      Seq((0L, 98L, 1L, 10.50), (1L, 100L, 1L, 2.25), (2L, 90L, 2L, 5.00)) ++
        (10L to 21L).map(i => (i, 10L, 3L, 1.00))
    val dir = java.nio.file.Files.createTempDirectory("rfm_fix").toString
    rows.toDF("event_id", "day", "user_id", "value")
      .withColumn("ts", timestamp_seconds(col("day") * 86400L))
      .withColumn("event_type", lit("A")).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("planted RFM: exact recency/frequency/monetary and segments") {
    val out = SparkEntry.queries("q_events_rfm")(spark, rfmDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4), r.getString(5))))
      .toMap
    assert(out(1L) == ((0L, 2L, 12.75, "active", "light")))
    assert(out(2L) == ((10L, 1L, 5.00, "warm", "light")))
    assert(out(3L) == ((90L, 12L, 12.00, "dormant", "medium")))
  }

  test("q3: top-10 lowers to TakeOrderedAndProject; revenue descends totally") {
    val df = SparkEntry.queries("q3_shipping_priority")(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val rev = rows.map(_.getDouble(1)).toSeq
    assert(rev == rev.sorted.reverse, "revenue must be non-increasing")
  }
}
