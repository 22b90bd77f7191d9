package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_events_stickiness: hand-computed DAU/MAU on a
  * planted activity pattern, plus the ratio invariants on the corpus.
  */
class StickinessSpec extends SparkSpecBase {
  import spark.implicits._

  /** user 1 active days {0, 30}; user 2 active day {30}.
    * day 0: dau 1, mau(days -27..0) = {u1} -> 1, stickiness 1.
    * day 30: dau 2, mau(days 3..30) = {u1, u2} -> 2, stickiness 1.
    * (u1's day-0 presence ages out of the 28-day window by day 30:
    * day 0 contributes to obs days 0..27 only.)
    */
  test("planted activity: window aging is exact") {
    val rows = Seq((1L, 1L, 0L), (2L, 1L, 30L), (3L, 2L, 30L))
    val dir = java.nio.file.Files.createTempDirectory("stick_fix").toString
    rows.toDF("event_id", "user_id", "day")
      .withColumn("ts", timestamp_seconds(col("day") * 86400L))
      .withColumn("event_type", lit("A"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_events_stickiness")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L) == ((1L, 1L, 1.0)))
    assert(out(30L) == ((2L, 2L, 1.0)))
    assert(out.size == 2, "only days with actual activity report")
  }

  /** Span-merge boundaries of the delta-sweep MAU: u1 active {0, 5, 40}
    * — days 0 and 5 have OVERLAPPING [d, d+27] windows (one merged span
    * [0, 32]; u1 must count ONCE on day 5), and day 40 starts a second
    * span (gap 35 > 27). u2 active {28}: on day 28 u1's first span
    * still covers (32 >= 28) -> mau 2; on day 40 u2's window [28, 55]
    * covers -> mau 2. u3 active {70}: u1's second span ends at 67 and
    * u2's at 55, so mau(70) = 1 — the merged-span end ages out exactly.
    */
  test("planted spans: overlap never double-counts, merged ends age out exactly") {
    val rows = Seq((1L, 1L, 0L), (2L, 1L, 5L), (3L, 1L, 40L),
      (4L, 2L, 28L), (5L, 3L, 70L))
    val dir = java.nio.file.Files.createTempDirectory("stick_spans").toString
    rows.toDF("event_id", "user_id", "day")
      .withColumn("ts", timestamp_seconds(col("day") * 86400L))
      .withColumn("event_type", lit("A"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_events_stickiness")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(0L -> ((1L, 1L)), 5L -> ((1L, 1L)),
      28L -> ((1L, 2L)), 40L -> ((1L, 2L)), 70L -> ((1L, 1L))))
  }

  test("corpus: dau <= mau everywhere and the ratio is their exact quotient") {
    val rows = SparkEntry.queries("q_events_stickiness")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))
      assert(r.getDouble(3) == r.getLong(1).toDouble / r.getLong(2))
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
  }
}
