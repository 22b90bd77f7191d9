package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.StreamingEvents
import graft.streaming.StreamingEvents.{Ev, Session}

/** Batch/stream parity: the Structured Streaming operators must produce
  * exactly the rows their batch counterparts produce on the same
  * fixture (the contract claimed in EventsQ's doc). Streams are driven
  * with MemoryStream; a far-future sentinel event advances the
  * watermark so append-mode windows and event-time timeouts flush.
  */
class StreamingEventsSpec extends SparkSpecBase {
  import spark.implicits._

  /** The sf0.001 events as case-class rows (epoch seconds). */
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

  test("streaming tumbling window rollup equals the batch rollup") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val out = StreamingEvents.tumblingCounts(
      stream.toDF().withColumn("ts", timestamp_seconds(col("ts_sec"))))
    val q = out.writeStream.format("memory").queryName("tumbling_parity")
      .outputMode("append").start()
    try {
      stream.addData(fixture)
      q.processAllAvailable()
      stream.addData(Seq(sentinel(maxSec)))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("tumbling_parity")
      .filter(col("event_type") =!= "__flush")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val batch = Tables.events(spark, sfDir)
      .withColumn("bucket", date_trunc("hour", col("ts")))
      .groupBy("bucket", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select((unix_micros(col("bucket")) / lit(1000000L)).cast("long"),
        col("event_type"), col("n"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }

  test("streaming running stats equal the batch merge after incremental chunks") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val out = StreamingEvents.runningStats(stream.toDF())
    val q = out.writeStream.format("memory").queryName("running_parity")
      .outputMode("complete").start()
    try {
      // two chunks split mid-stream: the state store must MERGE, not
      // recompute — the streaming twin of q_events_incremental_agg
      val (a, b) = fixture.partition(_.ts_sec % 2 == 0)
      stream.addData(a)
      q.processAllAvailable()
      stream.addData(b)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("running_parity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet

    val batch = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"),
        min("value").as("min_value"), max("value").as("max_value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet

    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }

  test("streaming sessionization equals the batch gaps-and-islands query") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val out = StreamingEvents.sessionize(stream.toDS())
    val q = out.writeStream.format("memory").queryName("session_parity")
      .outputMode("append").start()
    try {
      stream.addData(fixture)
      q.processAllAvailable()
      stream.addData(Seq(sentinel(maxSec)))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("session_parity").as[Session]
      .collect()
      .filter(_.user_id >= 0) // drop the sentinel user's own session
      .map(s => (s.user_id, s.session_id, s.n_events, s.session_start_sec,
        s.session_end_sec))
      .toSet

    val batch = SparkEntry.queries("q_events_sessionize")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet

    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"sessions differ: missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }

  test("stream-stream attribution join equals the batch join on the fixture") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val out = StreamingEvents.attributionJoin(
      stream.toDF().withColumn("ts", timestamp_seconds(col("ts_sec"))))
    val q = out.writeStream.format("memory").queryName("attr_parity")
      .outputMode("append").start()
    try {
      stream.addData(fixture)
      q.processAllAvailable()
      stream.addData(Seq(sentinel(maxSec)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("attr_parity")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val batch = SparkEntry.queries("q_events_attribution")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(batch.nonEmpty, "fixture must contain view→click pairs")
    // the fixture truncates ts to whole seconds while the batch query
    // joins on microsecond timestamps, so pair membership must match
    // exactly and lag within the 1 s truncation granularity
    assert(streamed.keySet == batch.keySet,
      s"missing=${(batch.keySet -- streamed.keySet).take(3)} " +
        s"extra=${(streamed.keySet -- batch.keySet).take(3)}")
    batch.foreach { case (k, lag) =>
      assert(math.abs(streamed(k) - lag) <= 1L, s"pair $k: ${streamed(k)} vs $lag")
    }
  }

  test("readEventsStream drives the tumbling rollup from the parquet file source") {
    // production entry: the same events parquet staged into a stream
    // directory (the file source watches directories)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events-000.parquet"))
    val stream = StreamingEvents.readEventsStream(spark, dir.toString)
    assert(stream.isStreaming)
    val q = StreamingEvents.tumblingCounts(stream)
      .writeStream.format("memory").queryName("file_source_tumbling")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // append mode without a watermark-advancing later file emits only
    // windows the watermark passed — at minimum the early ones; the
    // plumbing (schema, nanos handling, watermarking) is what's under test
    val n = spark.table("file_source_tumbling").count()
    val total = graft.sources.Tables.events(spark, sfDir)
      .select(date_trunc("hour", col("ts")), col("event_type")).distinct().count()
    assert(n >= 1 && n <= total, s"$n windows vs $total batch groups")
  }

  test("streaming dedup drops replayed records within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000L
    val stream = MemoryStream[Ev]
    val deduped = StreamingEvents.dedupStream(
      stream.toDF().withColumn("ts", timestamp_seconds(col("ts_sec"))),
      keyCols = Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // batch 1: two distinct events, one duplicated in-batch
      stream.addData(Seq(
        Ev(100, 1, "view", t0, 1.0),
        Ev(100, 1, "view", t0, 1.0), // exact replay
        Ev(101, 1, "view", t0 + 60, 2.0)))
      q.processAllAvailable()
      // batch 2: replay of 100 arrives again (still inside the horizon)
      stream.addData(Seq(
        Ev(100, 1, "view", t0 + 120, 1.0),
        Ev(102, 1, "view", t0 + 180, 3.0)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_stream").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(100L, 101L, 102L),
      s"each event_id must survive exactly once, got ${ids.toSeq}")
  }

  test("sessions respect the 30-minute gap on a hand-pinned trace") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000L
    val trace = Seq(
      Ev(1, 7, "view", t0, 1.0),
      Ev(2, 7, "view", t0 + 600, 1.0), // +10 min → same session
      Ev(3, 7, "view", t0 + 600 + 1800, 1.0), // exactly 30 min gap → same
      Ev(4, 7, "view", t0 + 600 + 1800 + 1801, 1.0)) // 30m01s → NEW session
    val stream = MemoryStream[Ev]
    val q = StreamingEvents.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("session_gap")
      .outputMode("append").start()
    try {
      stream.addData(trace)
      q.processAllAvailable()
      stream.addData(Seq(sentinel(t0 + 2 * 3600)))
      q.processAllAvailable()
    } finally q.stop()
    val sessions = spark.table("session_gap").as[Session]
      .collect().filter(_.user_id == 7).sortBy(_.session_id)
    assert(sessions.length == 2)
    assert(sessions(0).n_events == 3 && sessions(0).session_start_sec == t0)
    assert(sessions(1).n_events == 1 &&
      sessions(1).session_start_sec == t0 + 600 + 1800 + 1801)
  }

  test("streaming anomaly scorer equals the batch query (train batch, score stream)") {
    implicit val sqlCtx = spark.sqlContext
    // train on the batch table (the deployment contract: stats are a
    // batch artifact, the stream scores statelessly against them)
    val stats = graft.queries.EventsQ.anomalyStats(Tables.events(spark, sfDir))
    val stream = MemoryStream[Ev]
    val out = StreamingEvents.anomalyStream(stream.toDF(), stats)
    val q = out.writeStream.format("memory").queryName("anomaly_parity")
      .outputMode("append").start()
    try {
      stream.addData(fixture)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("anomaly_parity").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    val batch = SparkEntry.queries("q_events_anomaly")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(batch.nonEmpty, "fixture must contain anomalies")
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }
}
