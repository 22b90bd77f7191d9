package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.StreamingEvents

/** Batch/stream parity for the SCD2 build: the streaming operator must
  * emit exactly the CLOSED versions q_events_scd2 reports on the same
  * fixture, with the open version carried in state across micro-batch
  * boundaries.
  */
class StreamingScd2Spec extends SparkSpecBase {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[(Long, Long, String, Long)]],
                        name: String): Seq[(Long, Int, String, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, String, Long)]
    val df = stream.toDF().toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "user_id", "event_type", "ts")
    val q = StreamingEvents.scd2Stream(df)
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
  }

  test("two time-ordered batches emit exactly the batch query's closed versions") {
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(e => (e._4, e._1)).toSeq
    val (b1, b2) = events.splitAt(events.length / 2)
    val streamed = runStream(Seq(b1, b2), "scd2_parity").toSet
    val batch = SparkEntry.queries("q_events_scd2")(spark, sfDir)
      .filter(!col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(streamed == batch)
  }

  test("open version crosses the batch boundary and closes at the next change") {
    val t0 = 1700000000000000L
    // batch 1 opens (7, A); batch 2's same-value event is a no-op, the
    // B change closes v1 and opens v2; nothing emits for the open v2
    val out = runStream(Seq(
      Seq((1L, 7L, "A", t0)),
      Seq((2L, 7L, "A", t0 + 1000000L), (3L, 7L, "B", t0 + 2000000L))),
      "scd2_state")
    assert(out == Seq((7L, 1, "A", t0, t0 + 2000000L)))
  }
}
