package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_events_watermark_advisor: planted out-of-order
  * arrivals with hand-computed lateness per event, and distribution
  * invariants on the corpus.
  */
class WatermarkAdvisorSpec extends SparkSpecBase {
  import spark.implicits._

  /** Arrival (event_id) order for user 1 carries event-times
    * 100, 95, 100, 40, 200 (seconds): lateness 0, 5s, 0, 60s, 0 →
    * buckets on_time×3, lt_10s×1, lt_600s×1 (60 s is NOT lt_60s — the
    * bucket bound is exclusive). User 2 is in-order → on_time×2.
    */
  private lazy val plantedDir: String = {
    val rows = Seq(
      (0L, 100L, 1L), (1L, 95L, 1L), (2L, 100L, 1L), (3L, 40L, 1L),
      (4L, 200L, 1L), (10L, 7L, 2L), (11L, 8L, 2L))
    val dir = java.nio.file.Files.createTempDirectory("wm_fix").toString
    rows.toDF("event_id", "sec", "user_id")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("event_type", lit("A"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("planted arrivals: exact bucket counts and max lateness") {
    val out = SparkEntry.queries("q_events_watermark_advisor")(spark, plantedDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out("a_on_time") == ((5L, 0L, 5.0 / 7)))
    assert(out("c_lt_10s") == ((1L, 5000000L, 1.0 / 7)))
    assert(out("e_lt_600s") == ((1L, 60000000L, 1.0 / 7)))
    assert(out.size == 3)
  }

  test("corpus: fractions sum to 1, buckets partition all events") {
    val rows = SparkEntry.queries("q_events_watermark_advisor")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val total = graft.sources.Tables.events(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == total)
    val fracSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(fracSum - 1.0) < 1e-9)
  }
}
