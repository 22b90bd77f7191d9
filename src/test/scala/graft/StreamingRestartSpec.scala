package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.streaming.StreamingEvents

/** Exactly-once across restarts: a checkpointed file-source query is
  * stopped mid-stream and restarted with the same checkpoint; the
  * restarted query must resume from the recorded offsets — emitting
  * each closed window exactly once in total, never re-emitting what
  * the first incarnation already wrote. This is the operational
  * contract a 24/7 ingest pipeline actually relies on (driver loss,
  * deploys, spot preemption).
  */
/** Raw event row in the parquet's physical schema (int64 nano ts). */
final case class RestartEv(event_id: Long, ts: Long, user_id: Long,
                           event_type: String, value: Double, props: String)

class StreamingRestartSpec extends SparkSpecBase {
  import spark.implicits._

  private type E = RestartEv
  private val E = RestartEv

  // the testdata generator has shipped events.ts as BOTH int64 nanos and
  // timestamp[us] (NTZ) across regenerations; the restart contract must
  // hold for either physical shape, so the same scenario runs once per
  // shape with a fixture written in that shape
  for (shape <- Seq("int64-nanos", "timestamp-us"))
  test(s"checkpointed tumbling rollup survives a restart without duplicate windows ($shape)") {
    val t0 = 1700000000L
    val srcDir = Files.createTempDirectory("restart_src").toString
    val outDir = Files.createTempDirectory("restart_out").toString
    val ckpt = Files.createTempDirectory("restart_ckpt").toString

    def writeBatch(name: String, rows: Seq[E]): Unit = {
      // the file source watches a flat directory: stage the batch, then
      // drop its single parquet file in atomically (as an ingester would)
      val tmp = Files.createTempDirectory("restart_stage").toString
      val df =
        if (shape == "int64-nanos") rows.toDF()
        else rows.toDF().withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Files.copy(Paths.get(part), Paths.get(s"$srcDir/$name.parquet"))
    }

    def startQuery() = {
      // readEventsStream discovers the physical ts shape from the files
      // present and normalizes (Tables.normalizeTs)
      val stream = StreamingEvents.readEventsStream(spark, srcDir)
      StreamingEvents.tumblingCounts(stream)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    def ev(id: Long, sec: Long, typ: String): E =
      E(id, sec * 1000000000L, 1L, typ, 1.0, "{}")

    // incarnation 1: two closed hours + watermark-advancing tail
    writeBatch("b1", Seq(
      ev(1, t0, "view"), ev(2, t0 + 60, "view"),
      ev(3, t0 + 3600, "click"),
      ev(4, t0 + 8 * 3600, "view"))) // advances watermark past hours 1-2
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    val afterFirst = spark.read.parquet(outDir)
      .select("window_start_sec", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(afterFirst.nonEmpty, "first incarnation must emit the closed windows")

    // incarnation 2: same checkpoint, new data closing the tail hour
    writeBatch("b2", Seq(
      ev(5, t0 + 8 * 3600 + 60, "view"),
      ev(6, t0 + 16 * 3600, "view"))) // advances watermark past hour 9
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val rows = spark.read.parquet(outDir)
      .select("window_start_sec", "event_type", "n").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val keys = rows.map(t => (t._1, t._2))
    assert(keys.distinct.length == keys.length,
      s"restart re-emitted windows: ${rows.toSeq.sortBy(_._1)}")
    // the closed windows carry exact batch counts
    val byKey = rows.map(t => (t._1, t._2) -> t._3).toMap
    assert(byKey((t0 / 3600 * 3600, "view")) == 2L)
    assert(byKey.contains((t0 + 8 * 3600) / 3600 * 3600 -> "view"),
      s"hour closed by incarnation 2 missing: ${rows.toSeq.sortBy(_._1)}")
  }

  for (shape <- Seq("int64-nanos", "timestamp-us"))
  test(s"debounce lag state survives a restart — in-gap event stays suppressed ($shape)") {
    val t0 = 1700000000L
    val srcDir = Files.createTempDirectory("deb_restart_src").toString
    val outDir = Files.createTempDirectory("deb_restart_out").toString
    val ckpt = Files.createTempDirectory("deb_restart_ckpt").toString

    def writeBatch(name: String, rows: Seq[E]): Unit = {
      val tmp = Files.createTempDirectory("deb_restart_stage").toString
      val df =
        if (shape == "int64-nanos") rows.toDF()
        else rows.toDF().withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Files.copy(Paths.get(part), Paths.get(s"$srcDir/$name.parquet"))
    }

    def startQuery() = {
      val stream = StreamingEvents.readEventsStream(spark, srcDir)
      StreamingEvents.debounceStream(stream).toDF()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    def ev(id: Long, sec: Long): E =
      E(id, sec * 1000000000L, 1L, "click", 1.0, "{}")

    // incarnation 1: the key's first event is emitted, state = t0
    writeBatch("b1", Seq(ev(1, t0)))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // incarnation 2, same checkpoint: +30 s must stay SUPPRESSED (lag
    // state recovered — a state loss would emit it as a first), +100 s
    // revives (gap 70 s from the +30 event)
    writeBatch("b2", Seq(ev(2, t0 + 30), ev(3, t0 + 100)))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val kept = spark.read.parquet(outDir).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L),
      s"restart broke the debounce state: kept $kept")
  }
}
