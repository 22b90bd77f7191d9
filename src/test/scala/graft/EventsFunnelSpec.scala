package graft

import java.nio.file.Files

/** The funnel's ORDERING constraint on a constructed fixture — the
  * sf corpus happens to satisfy view≤click≤purchase for every
  * converting user (150/150/150), so the oracle gate alone would let a
  * three-independent-counts implementation pass. These users force the
  * sequence logic to fire.
  */
class EventsFunnelSpec extends SparkSpecBase {
  import spark.implicits._

  test("out-of-order events do not convert; re-occurring steps after the threshold do") {
    val ns = (sec: Long) => sec * 1000000000L
    // (event_id, ts_nanos, user_id, event_type, value, props)
    val rows = Seq(
      // user 1: clean view -> click -> purchase
      (1L, ns(10), 1L, "view", 1.0, "{}"),
      (2L, ns(20), 1L, "click", 1.0, "{}"),
      (3L, ns(30), 1L, "purchase", 1.0, "{}"),
      // user 2: purchase BEFORE any view — must not pass stages 2/3
      (4L, ns(10), 2L, "purchase", 1.0, "{}"),
      (5L, ns(20), 2L, "view", 1.0, "{}"),
      // user 3: early click before view doesn't count, the later one does
      (6L, ns(10), 3L, "click", 1.0, "{}"),
      (7L, ns(20), 3L, "view", 1.0, "{}"),
      (8L, ns(30), 3L, "click", 1.0, "{}"),
      (9L, ns(40), 3L, "purchase", 1.0, "{}"),
      // user 4: view only
      (10L, ns(10), 4L, "view", 1.0, "{}"))
    val dir = Files.createTempDirectory("funnel-fixture").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q_events_funnel")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "view", 4L), (2, "click", 2L), (3, "purchase", 2L)),
      got.mkString(", "))
  }
}
