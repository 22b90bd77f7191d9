package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_events_scd2: exact versioned intervals on a
  * planted change log, and the SCD2 shape invariants on the corpus
  * (contiguous versions, half-open interval chaining, one open row per
  * user, no same-value consecutive versions).
  */
class Scd2Spec extends SparkSpecBase {
  import spark.implicits._

  /** user 1: A(0) A(10) B(20) B(30) A(40) — runs collapse, the B->A
    * re-change opens a THIRD version (SCD2 tracks history, it does not
    * dedup values); user 2: single C(5) stays open from its first event.
    */
  private lazy val plantedDir: String = {
    val rows = Seq(
      (0L, 0L, 1L, "A"), (1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"),
      (3L, 30L, 1L, "B"), (4L, 40L, 1L, "A"), (5L, 5L, 2L, "C"))
    val dir = java.nio.file.Files.createTempDirectory("scd2_fix").toString
    rows.toDF("event_id", "sec", "user_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("planted change log: exact versioned intervals") {
    val out = SparkEntry.queries("q_events_scd2")(spark, plantedDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
      .toSeq
    val s = 1000000L // seconds -> micros
    assert(out == Seq(
      (1L, 1, "A", 0L * s, 20L * s, false),
      (1L, 2, "B", 20L * s, 40L * s, false),
      (1L, 3, "A", 40L * s, -1L, true),
      (2L, 1, "C", 5L * s, -1L, true)))
  }

  test("corpus invariants: versions chain half-open, one current row per user") {
    val rows = SparkEntry.queries("q_events_scd2")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (user, g) =>
      val byV = g.sortBy(_.getInt(1))
      assert(byV.map(_.getInt(1)).toSeq == (1 to byV.length),
        s"user $user versions not contiguous")
      // exactly the last version is open/current
      assert(byV.dropRight(1).forall(r => !r.isNullAt(4) && !r.getBoolean(5)))
      assert(byV.last.isNullAt(4) && byV.last.getBoolean(5))
      byV.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.getLong(4) == b.getLong(3),
            s"user $user: valid_to must equal next valid_from")
          assert(a.getString(2) != b.getString(2),
            s"user $user: consecutive versions must differ in value")
        case _ =>
      }
    }
    // version count = change-row count, independently derived
    val events = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val changes = events.groupBy(_._1).map { case (_, g) =>
      val seq = g.sortBy(e => (e._3, e._4)).map(_._2).toSeq
      1 + seq.sliding(2).count { case Seq(a, b) => a != b; case _ => false }
    }.sum
    assert(rows.length == changes)
  }
}
