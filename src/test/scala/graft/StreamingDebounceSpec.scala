package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.StreamingEvents

/** Batch/stream parity for the debounce: the streaming operator must
  * emit exactly the event_ids q_events_debounce keeps on the same
  * fixture (event-time-ordered arrival), and carry lag state across
  * micro-batch boundaries.
  */
class StreamingDebounceSpec extends SparkSpecBase {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[(Long, Long, String, Long)]],
                        name: String): Set[Long] = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, String, Long)]
    val df = stream.toDF().toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "user_id", "event_type", "ts")
    val q = StreamingEvents.debounceStream(df)
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).collect().map(_.getLong(0)).toSet
  }

  test("two time-ordered batches reproduce the batch debounce exactly") {
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(e => (e._4, e._1)).toSeq
    val (b1, b2) = events.splitAt(events.length / 2)
    val streamed = runStream(Seq(b1, b2), "debounce_parity")
    val batch = SparkEntry.queries("q_events_debounce")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
  }

  test("lag state crosses the batch boundary: in-gap suppressed, post-gap revived") {
    val t0 = 1700000000000000L
    val b1 = Seq((1L, 7L, "click", t0))
    // +30s: suppressed (gap 30 from batch-1 state); +100s: gap 70 from
    // the +30 event (lag semantics — previous EVENT, kept or not) → kept
    val b2 = Seq((2L, 7L, "click", t0 + 30000000L),
      (3L, 7L, "click", t0 + 100000000L))
    val kept = runStream(Seq(b1, b2), "debounce_state")
    assert(kept == Set(1L, 3L))
  }
}
