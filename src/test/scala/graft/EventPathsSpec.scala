package graft

import java.sql.Timestamp

/** Ground truth for q_events_paths: trigram journeys respect session
  * boundaries (a 30-minute gap splits the path stream), counts
  * aggregate across users, and the top-k cut is total (n DESC, path
  * ASC).
  */
class EventPathsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(id: Long, sec: Long, user: Long, typ: String) =
    (id, new Timestamp(sec * 1000L), user, typ, 1.0, "{}")

  /** user 1: A,B,C then a 31-minute gap then D,E,F — two sessions, so
    * exactly two trigrams (no gap-crossing B>C>D / C>D>E). user 2:
    * A,B,C again in one session.
    */
  private lazy val plantedDir: String = {
    val rows = Seq(
      ev(0, 1000, 1, "A"), ev(1, 1010, 1, "B"), ev(2, 1020, 1, "C"),
      ev(3, 1020 + 1860, 1, "D"), ev(4, 1020 + 1870, 1, "E"),
      ev(5, 1020 + 1880, 1, "F"),
      ev(6, 5000, 2, "A"), ev(7, 5010, 2, "B"), ev(8, 5020, 2, "C"))
    val dir = java.nio.file.Files.createTempDirectory("paths_fix").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("planted sessions: gap splits journeys; counts sum across users") {
    val out = SparkEntry.queries("q_events_paths")(spark, plantedDir)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(out.toMap == Map("A>B>C" -> 2L, "D>E>F" -> 1L))
    assert(out.head == ("A>B>C" -> 2L), "ordered by count DESC")
  }

  test("corpus run: at most 25 paths, all 3-step, ordered by (n DESC, path ASC)") {
    val rows = SparkEntry.queries("q_events_paths")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.size <= 25)
    assert(rows.forall(_._1.count(_ == '>') == 2))
    val resorted = rows.sortBy { case (p, n) => (-n, p) }
    assert(rows.toSeq == resorted.toSeq)
  }
}
