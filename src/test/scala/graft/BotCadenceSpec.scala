package graft

import java.sql.Timestamp

/** Ground truth for q_events_bot_cadence: a metronome user flags as a
  * bot (cv² = 0), a bursty user doesn't, and short histories never
  * flag regardless of regularity.
  */
class BotCadenceSpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(id: Long, us: Long, user: Long) =
    (id, new Timestamp(us / 1000), user, "click", 1.0, "{}")

  /** user 1: 6 events exactly 60 s apart (bot). user 2: gaps
    * 1/10/100/1000/10000 s (human-bursty). user 3: 3 events 60 s
    * apart (regular but only 2 gaps — under the n >= 5 floor).
    */
  private lazy val plantedDir: String = {
    val u1 = (0 until 6).map(i => ev(i.toLong, 1000000000L + i * 60000000L, 1))
    var t = 5000000000L
    val gaps = Seq(1L, 10L, 100L, 1000L, 10000L).map(_ * 1000000L)
    val u2 = ev(10, t, 2) +: gaps.zipWithIndex.map { case (g, i) =>
      t += g; ev(11 + i, t, 2)
    }
    val u3 = (0 until 3).map(i => ev(20 + i.toLong, 9000000000L + i * 60000000L, 3))
    val dir = java.nio.file.Files.createTempDirectory("bot_fix").toString
    (u1 ++ u2 ++ u3).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("planted cadences: metronome flags, bursty and short histories don't") {
    val out = SparkEntry.queries("q_events_bot_cadence")(spark, plantedDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getBoolean(5))).toMap
    val (n1, span1, mean1, cv1, bot1) = out(1L)
    assert(n1 == 5L && span1 == 5L * 60000000L)
    assert(mean1 == 60000000.0 && cv1 == 0.0 && bot1)
    val (_, _, _, cv2v, bot2) = out(2L)
    assert(cv2v > 1.0 && !bot2, s"bursty cv2 was $cv2v")
    val (n3, _, _, cv3, bot3) = out(3L)
    assert(n3 == 2L && cv3 == 0.0 && !bot3, "regular but under the gap floor")
  }

  test("corpus run: cv2 >= 0, span telescopes, flags respect the floor") {
    val rows = SparkEntry.queries("q_events_bot_cadence")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, span) = (r.getLong(1), r.getLong(2))
      assert(n >= 1L && span >= 0L)
      if (!r.isNullAt(4)) assert(r.getDouble(4) >= -1e-9)
      if (r.getBoolean(5)) assert(n >= 5L && r.getDouble(4) < 0.05)
    }
  }
}
