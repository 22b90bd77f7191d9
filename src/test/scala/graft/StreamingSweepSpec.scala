package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.StreamingEvents
import graft.streaming.StreamingEvents.{Ev, Session, StickDelta}

/** Batch/stream parity for the two round-9 sweep rewrites' streaming
  * twins (round-10 verdict #7):
  *
  *   - q_events_stickiness ↔ stickinessDeltaStream: summing EVERY
  *     emitted delta and running the same day-grain sweep must
  *     reproduce the batch (day, dau, mau, stickiness) table exactly —
  *     including when the stream arrives as several micro-batches
  *     (corrections are additive deltas, never retractions);
  *   - q_events_interval_overlap ↔ sessionize → the SAME factored
  *     delta-sweep tail (EventsQ.intervalOverlapFromSpans) over the
  *     incrementally-emitted span stream.
  */
class StreamingSweepSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val fixture: Seq[Ev] =
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        floor(unix_micros(col("ts")) / lit(1000000L)).cast("long").as("ts_sec"),
        col("value"))
      .collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4))).toIndexedSeq

  private lazy val maxSec = fixture.map(_.ts_sec).max
  private def sentinel(afterSec: Long) =
    Ev(event_id = -1L, user_id = -1L, event_type = "__flush",
      ts_sec = afterSec + 48 * 3600, value = 0.0)

  /** Replay the batch sweep over a collected delta set: running-sum
    * the MAU deltas in day order and read it off at each DAU day.
    */
  private def sweep(deltas: Seq[StickDelta]): Set[(Long, Long, Long, Double)] = {
    val mauNet = deltas.groupBy(_.day).view
      .mapValues(_.map(_.mau_net).sum).toMap
    val dau = deltas.filter(_.dau_net > 0).groupBy(_.day).view
      .mapValues(_.map(_.dau_net).sum).toMap
    val allDays = (mauNet.keySet ++ dau.keySet).toSeq.sorted
    var run = 0L
    val mauAt = allDays.map { d =>
      run += mauNet.getOrElse(d, 0L); d -> run
    }.toMap
    dau.map { case (d, n) =>
      (d, n, mauAt(d), n.toDouble / mauAt(d).toDouble)
    }.toSet
  }

  private def batchStickiness: Set[(Long, Long, Long, Double)] =
    SparkEntry.queries("q_events_stickiness")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("stickiness delta stream sweeps to the batch DAU/MAU table (single batch)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val out = StreamingEvents.stickinessDeltaStream(stream.toDS())
    val q = out.writeStream.format("memory").queryName("stick_parity_1")
      .outputMode("append").start()
    try {
      stream.addData(fixture)
      q.processAllAvailable()
    } finally q.stop()
    val deltas = spark.table("stick_parity_1").as[StickDelta].collect().toSeq
    val batch = batchStickiness
    assert(batch.nonEmpty)
    val streamed = sweep(deltas)
    assert(streamed == batch,
      s"stickiness differs: missing=${(batch -- streamed).take(3)} " +
        s"extra=${(streamed -- batch).take(3)}")
  }

  test("stickiness deltas stay exact across micro-batch splits (corrections are additive)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val out = StreamingEvents.stickinessDeltaStream(stream.toDS())
    val q = out.writeStream.format("memory").queryName("stick_parity_2")
      .outputMode("append").start()
    try {
      // split by global time: per-user day order is preserved, so
      // later batches extend open spans (the correction-delta path)
      val cut = fixture.map(_.ts_sec).sorted.apply(fixture.size / 3)
      val cut2 = fixture.map(_.ts_sec).sorted.apply(2 * fixture.size / 3)
      stream.addData(fixture.filter(_.ts_sec <= cut))
      q.processAllAvailable()
      stream.addData(fixture.filter(e => e.ts_sec > cut && e.ts_sec <= cut2))
      q.processAllAvailable()
      stream.addData(fixture.filter(_.ts_sec > cut2))
      q.processAllAvailable()
    } finally q.stop()
    val deltas = spark.table("stick_parity_2").as[StickDelta].collect().toSeq
    val streamed = sweep(deltas)
    assert(streamed == batchStickiness,
      "split-batch delta stream diverged from the batch sweep")
  }

  test("interval overlap: streamed session spans through the factored sweep equal the batch query") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val out = StreamingEvents.sessionize(stream.toDS())
    val q = out.writeStream.format("memory").queryName("overlap_spans")
      .outputMode("append").start()
    try {
      stream.addData(fixture)
      q.processAllAvailable()
      stream.addData(Seq(sentinel(maxSec)))
      q.processAllAvailable()
    } finally q.stop()
    val spans = spark.table("overlap_spans").as[Session]
      .filter(col("user_id") >= 0) // drop the sentinel user
      .select(col("user_id"), col("session_id"),
        col("session_start_sec").as("start_sec"),
        col("session_end_sec").as("end_sec"))
      // the sweep tail self-joins its input (started × ended) — feed it
      // a materialized frame, exactly as the batch query's memoized
      // spans checkpoint does
      .localCheckpoint(true)
    val streamed = graft.queries.EventsQ.intervalOverlapFromSpans(spans)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = SparkEntry.queries("q_events_interval_overlap")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"overlap differs: missing=${(batch -- streamed).take(3)} " +
        s"extra=${(streamed -- batch).take(3)}")
  }
}
