package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Ground truth for q_events_trailing_range's ghost-row bucketed
  * window (r12): frames that cross an hour-bucket boundary must see
  * the previous bucket's last 300 seconds via the duplicated ghost
  * rows, ghosts must never surface in the output, and RANGE tie
  * semantics (all ts peers in-frame together) must survive the
  * bucketing.
  */
class TrailingRangeSpec extends SparkSpecBase {
  import spark.implicits._

  // an exact hour boundary: every offset below is relative to it
  private val B = 1700000000L - (1700000000L % 3600L)

  /** type "a": straddles the boundary.
    *   -200s, -50s (both inside the ghost tail), +20s, +280s, +320s
    * type "b": a tie pair exactly at +10s.
    * type "c": NEGATIVE epochs (pre-1970) straddling the -3600s and 0s
    *   bucket edges — truncating `div` and floor-semantics `pmod`
    *   disagree below zero (ts=-3800 truncates into bucket -1 but
    *   floors into -2), so a mixed-semantics bucketing silently drops
    *   cross-boundary frame rows exactly here (r12 ADVICE).
    */
  private lazy val dir: String = {
    val rows = Seq(
      (1L, B - 200, "a", 1.0), (2L, B - 50, "a", 2.0),
      (3L, B + 20, "a", 4.0), (4L, B + 280, "a", 8.0),
      (5L, B + 320, "a", 16.0),
      (6L, B + 10, "b", 1.0), (7L, B + 10, "b", 2.0),
      (11L, -3800L, "c", 1.0), (12L, -3650L, "c", 2.0),
      (13L, -3500L, "c", 4.0), (14L, -100L, "c", 32.0),
      (15L, 50L, "c", 64.0))
    val d = java.nio.file.Files.createTempDirectory("trail_fix").toString
    rows.map { case (id, sec, t, v) =>
      (id, new Timestamp(sec * 1000L), id % 3, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("cross-boundary frames see the previous bucket's tail; ghosts never surface") {
    val out = SparkEntry.queries("q_events_trailing_range")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    // one output row per input event — a leaked ghost would duplicate
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 11L, 12L, 13L, 14L, 15L))
    val m = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(1L) == ((1L, 1.0)))          // frame [-500,-200]: itself
    assert(m(2L) == ((2L, 3.0)))          // [-350,-50]: ids 1,2
    // id 3 at +20 lives in the NEXT bucket: frame [-280,+20] must pick
    // up ids 1 (-200) and 2 (-50) through their ghost copies
    assert(m(3L) == ((3L, 7.0)), s"boundary-crossing frame broken: ${m(3L)}")
    // id 4 at +280: [-20,+280] -> ghost id 2 (-50) now OUT of range,
    // ids 3,4 in
    assert(m(4L) == ((2L, 12.0)), s"ghost range cut broken: ${m(4L)}")
    // id 5 at +320: [+20,+320] -> ids 3,4,5 — no ghosts in range
    assert(m(5L) == ((3L, 28.0)))
    // RANGE peers: the tie pair at +10 sees BOTH rows in each frame
    assert(m(6L) == ((2L, 3.0)) && m(7L) == ((2L, 3.0)),
      "RANGE tie semantics must include all ts peers")
  }

  test("negative epochs: bucket assignment and ghost predicate share floor semantics") {
    val out = SparkEntry.queries("q_events_trailing_range")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    val m = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(11L) == ((1L, 1.0)))         // [-4100,-3800]: itself
    assert(m(12L) == ((2L, 3.0)))         // [-3950,-3650]: 11,12
    // id 13 at -3500 floors into bucket -1; its frame [-3800,-3500]
    // must see 11 and 12 through ghosts of floor-bucket -2's tail —
    // truncating `div` put all three in different buckets than pmod
    // assumed and lost both
    assert(m(13L) == ((3L, 7.0)), s"negative-epoch boundary frame broken: ${m(13L)}")
    assert(m(14L) == ((1L, 32.0)))        // [-400,-100]: itself
    // id 15 at +50 (bucket 0): frame [-250,+50] sees 14 via its ghost
    assert(m(15L) == ((2L, 96.0)), s"ghost across the zero edge broken: ${m(15L)}")
  }

  test("corpus run: output multiplicity equals input (no ghost leakage at any boundary)") {
    val n = SparkEntry.queries("q_events_trailing_range")(spark, sfDir).count()
    val expected = graft.sources.Tables.events(spark, sfDir).count()
    assert(n == expected, s"$n rows out vs $expected events in")
  }
}
