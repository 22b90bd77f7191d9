package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_events_transitions: exact counts on planted
  * per-user sequences (no cross-user transitions), and per-row
  * probability consistency on the corpus.
  */
class TransitionsSpec extends SparkSpecBase {
  import spark.implicits._

  /** user 1: A(0s) → B(10s) → A(20s); user 2: A(5s) → B(15s). Expected
    * transitions: (A,B) 2, (B,A) 1 — and never a cross-user (A,A) from
    * user 1's tail meeting user 2's head.
    */
  private lazy val plantedDir: String = {
    val rows = Seq(
      (0L, 0L, 1L, "A", 1.0, "{}"),
      (1L, 10L, 1L, "B", 1.0, "{}"),
      (2L, 20L, 1L, "A", 1.0, "{}"),
      (3L, 5L, 2L, "A", 1.0, "{}"),
      (4L, 15L, 2L, "B", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("transitions_fix").toString
    rows.toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("planted sequences: exact transition counts, user-scoped windows") {
    val out = SparkEntry.queries("q_events_transitions")(spark, plantedDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out == Map(
      ("A", "B") -> ((2L, 1.0)),
      ("B", "A") -> ((1L, 1.0))))
  }

  test("corpus run: transition mass = events - first-events; rows normalize per prev_type") {
    val rows = SparkEntry.queries("q_events_transitions")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val events = graft.sources.Tables.events(spark, sfDir)
    val total = events.count()
    val users = events.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == total - users,
      "every event except each user's first contributes one transition")
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val psum = g.map(_.getDouble(3)).sum
      assert(math.abs(psum - 1.0) < 1e-9, s"P(next|prev) must sum to 1, got $psum")
    }
  }
}
