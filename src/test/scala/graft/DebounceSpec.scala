package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_events_debounce: lag-gap semantics on a planted
  * burst (suppression inside the 60 s gap, revival at exactly 60 s,
  * independence across keys), plus corpus-level invariants.
  */
class DebounceSpec extends SparkSpecBase {
  import spark.implicits._

  /** user 1 / click at t = 0, 30, 90, 100 s: 0 kept; 30 suppressed
    * (gap 30); 90 kept (gap from the PREVIOUS event — 30 s — is 60,
    * lag semantics, not kept-anchor semantics); 100 suppressed.
    * user 1 / view at 5 s and user 2 / click at 31 s are their keys'
    * firsts.
    */
  private lazy val plantedDir: String = {
    val rows = Seq(
      (0L, 0L, 1L, "click", 1.0, "{}"),
      (1L, 30L, 1L, "click", 1.0, "{}"),
      (2L, 90L, 1L, "click", 1.0, "{}"),
      (3L, 100L, 1L, "click", 1.0, "{}"),
      (4L, 5L, 1L, "view", 1.0, "{}"),
      (5L, 31L, 2L, "click", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("debounce_fix").toString
    rows.toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("planted burst: first kept, in-gap suppressed, 60s-gap revived, keys independent") {
    val kept = SparkEntry.queries("q_events_debounce")(spark, plantedDir)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L, 4L, 5L))
  }

  test("corpus run: per-key kept events are >= 60s apart from their predecessor event") {
    val rows = SparkEntry.queries("q_events_debounce")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val allEvents = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byKey = allEvents.groupBy(e => (e._2, e._3))
      .view.mapValues(_.sortBy(e => (e._4, e._1))).toMap
    val keptIds = rows.map(_.getLong(0)).toSet
    byKey.foreach { case (_, events) =>
      assert(keptIds.contains(events.head._1), "first event of every key is kept")
      events.sliding(2).filter(_.length == 2).foreach { pair =>
        val (prev, cur) = (pair(0), pair(1))
        val expectKeep = cur._4 - prev._4 >= 60000000L
        assert(keptIds.contains(cur._1) == expectKeep,
          s"event ${cur._1} kept=${keptIds.contains(cur._1)} expected $expectKeep")
      }
    }
  }
}
