package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.StreamingEvents
import graft.streaming.StreamingEvents.Ev

/** Ground truth for kmvDailyStream: after any prefix of the stream the
  * per-day sketch equals the batch KMV over the events seen so far —
  * incremental union is lossless — and re-observed users never change
  * the sketch.
  */
class StreamingKmvSpec extends SparkSpecBase {
  import spark.implicits._

  private val k = 64

  /** Batch reference: per-day bottom-k hashes + estimate, computed
    * with the engine's own hash expression over a static frame.
    */
  private def batchSketch(events: org.apache.spark.sql.DataFrame): Map[Long, (Int, Double)] =
    events
      .select(
        expr("floor(floor(unix_micros(ts) / 1000000) / 86400)")
          .cast("long").as("day"),
        conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 15),
          16, 10).cast("long").as("h"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (day, hs) =>
        val bottom = hs.map(_._2).distinct.sorted.take(k)
        val est =
          if (bottom.size < k) bottom.size.toDouble
          else (k - 1).toDouble * 1.152921504606846976e18 / bottom.last.toDouble
        day -> (bottom.size, est)
      }

  test("streaming per-day sketch equals the batch KMV after every prefix") {
    implicit val sqlCtx = spark.sqlContext
    val all = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        (unix_micros(col("ts")) / lit(1000000L)).cast("long").as("ts_sec"),
        col("value"))
      .as[Ev].collect().toSeq
    val (first, second) = all.splitAt(all.size / 2)

    val stream = MemoryStream[Ev]
    val out = StreamingEvents.kmvDailyStream(
      stream.toDF().withColumn("ts", timestamp_seconds(col("ts_sec"))))
    val q = out.writeStream.format("memory").queryName("kmv_parity")
      .outputMode("update").start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      val mid = spark.table("kmv_parity").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
      val midExpected = batchSketch(
        first.toDF().withColumn("ts", timestamp_seconds(col("ts_sec"))))
      assert(mid == midExpected, s"prefix mismatch: ${mid.size} vs ${midExpected.size}")

      stream.addData(second)
      q.processAllAvailable()
      // Update sink keeps latest row per key emission; take the last
      // emission per day
      val fin = spark.table("kmv_parity").collect()
        .zipWithIndex.sortBy(_._2)
        .map { case (r, _) => r.getLong(0) -> (r.getInt(1), r.getDouble(2)) }
        .toMap
      val finExpected = batchSketch(Tables.events(spark, sfDir))
      assert(fin == finExpected)

      // replaying already-seen users is a no-op on the sketch
      stream.addData(first)
      q.processAllAvailable()
      val replay = spark.table("kmv_parity").collect()
        .zipWithIndex.sortBy(_._2)
        .map { case (r, _) => r.getLong(0) -> (r.getInt(1), r.getDouble(2)) }
        .toMap
      assert(replay == finExpected, "re-observed users changed the sketch")
    } finally q.stop()
  }
}
