package graft

import java.sql.Timestamp

/** Hand-computed ground truth for the interval analytics pair: the
  * sweep-line peak concurrency (midnight-crossing sessions clip into
  * both days) and the sweep-rank interval-overlap degrees (long spans
  * must count each overlapping partner exactly once, and same-user
  * sessions must never count).
  */
class IntervalAnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(id: Long, sec: Long, user: Long) =
    (id, new Timestamp(sec * 1000), user, "click", 1.0, "{}")

  /** Day-0 sessions: u1 [100,200], u2 [150,150], u3 [180,180] and
    * [2100,2100] (gap 1920 > 1800 splits), u4 [86300,86500] crossing
    * midnight; day-1: u5 [86450,86450].
    */
  private lazy val dir: String = {
    val rows = Seq(
      ev(1, 100, 1), ev(2, 200, 1),
      ev(3, 150, 2),
      ev(4, 180, 3), ev(5, 2100, 3),
      ev(6, 86300, 4), ev(7, 86500, 4),
      ev(8, 86450, 5))
    val d = java.nio.file.Files.createTempDirectory("interval_fix").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("peak concurrency: per-day sweep, midnight session counts in both days") {
    // day 0: u1+u2 overlap at 150 (peak 2, first at 150) — u3's first
    // session at 180 re-reaches 2 but later; day 1: u4's clipped tail
    // meets u5 at 86450
    val rows = SparkEntry.queries("q_events_peak_concurrency")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((0L, 2L, 150L), (1L, 2L, 86450L)))
  }

  test("interval overlap: exact degrees, two-cell span not double-counted") {
    // u1 overlaps u2 and u3-s1 (degree 2); u2, u3-s1 each overlap only
    // u1; u3-s2 overlaps nothing; u4 (spanning midnight) overlaps u5
    // exactly once despite covering two sweep buckets
    val rows = SparkEntry.queries("q_events_interval_overlap")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      (1L, 1L, 2L), (2L, 1L, 1L), (3L, 1L, 1L), (4L, 1L, 1L), (5L, 1L, 1L)))
  }

  /** Spans spread across a ~70-day range so the sweep's adaptive time
    * buckets are NON-trivial: several buckets hold query rows (span
    * ends) but no start events, and vice versa — the dense driver
    * prefix must cover those gaps or the offset join silently drops
    * the query rows (the bug class this pins). Layout: u1 [0,100] and
    * u2 [50,150] overlap at the range start; u3 [3_000_000, 3_000_050]
    * and u4 [3_000_025, 3_000_075] overlap mid-range; u5 sits alone at
    * day 69 and must NOT appear (degree 0 rows are filtered).
    */
  private lazy val sparseDir: String = {
    val rows = Seq(
      ev(11, 0, 1), ev(12, 100, 1),
      ev(13, 50, 2), ev(14, 150, 2),
      ev(15, 3000000, 3), ev(16, 3000050, 3),
      ev(17, 3000025, 4), ev(18, 3000075, 4),
      ev(19, 6000000, 5))
    val d = java.nio.file.Files.createTempDirectory("interval_sparse").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("interval overlap: sparse spans across empty sweep buckets keep exact degrees") {
    val rows = SparkEntry.queries("q_events_interval_overlap")(spark, sparseDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      (1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 1L), (4L, 1L, 1L)))
  }
}
