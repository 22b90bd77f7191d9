package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Randomized exactness proofs for the round-9 sweep-rank operators:
  * the engine's pair-free formulations must agree with O(n²)/O(n·days)
  * brute-force models on arbitrary event sets — sessionization
  * included, so the property covers the full query surface, not just
  * the sweep kernel. (ScalaCheck used directly; the scalatest bridge
  * artifact isn't in the offline cache.)
  */
class SweepPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def checkProp(prop: Prop, minTests: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  private def writeEvents(rows: Seq[(Long, Long, Long)]): String = {
    // (event_id, user_id, ts_sec)
    val d = java.nio.file.Files.createTempDirectory("sweep_prop").toString
    rows.toDF("event_id", "user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("event_type", lit("A"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  /** 1800 s-gap sessionization model shared by both properties:
    * (user, 1-based session id in start order) -> (start, end).
    */
  private def modelSpans(rows: Seq[(Long, Long)]): Map[(Long, Long), (Long, Long)] =
    rows.groupBy(_._1).flatMap { case (u, evs) =>
      val ts = evs.map(_._2).sorted
      val spans = ts.tail.foldLeft(List((ts.head, ts.head))) {
        case (acc @ ((s, e) :: rest), t) =>
          if (t - e > 1800) (t, t) :: acc else (s, t) :: rest
        case (Nil, t) => List((t, t))
      }.reverse
      spans.zipWithIndex.map { case ((s, e), i) => (u, (i + 1).toLong) -> (s, e) }
    }

  test("interval overlap degrees equal the brute-force pair count (property)") {
    val gen = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 500000L)))
    checkProp(Prop.forAll(gen) { evs =>
      val rows = evs.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
      val dir = writeEvents(rows)
      val spans = modelSpans(rows.map(r => (r._2, r._3)))
      val expected = spans.toSeq.flatMap { case ((u, sid), (s, e)) =>
        val n = spans.count { case ((u2, _), (s2, e2)) =>
          u2 != u && s2 <= e && e2 >= s
        }
        if (n > 0) Some(((u, sid), n.toLong)) else None
      }.toMap
      val got = SparkEntry.queries("q_events_interval_overlap")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // the catalog query is top-100; generated span counts stay far below
      got == expected
    }, minTests = 8)
  }

  test("stickiness DAU/MAU equals the brute-force trailing-window model (property)") {
    val gen = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 80L)))
    checkProp(Prop.forAll(gen) { actives =>
      val rows = actives.zipWithIndex.map { case ((u, day), i) =>
        (i.toLong, u, day * 86400L)
      }
      val dir = writeEvents(rows)
      val presence = actives.toSet
      val days = actives.map(_._2).distinct.sorted
      val expected = days.map { d =>
        val dau = presence.count(_._2 == d).toLong
        val mau = presence.map(_._1).count(u =>
          ((d - 27) to d).exists(x => presence((u, x)))).toLong
        d -> ((dau, mau))
      }.toMap
      val got = SparkEntry.queries("q_events_stickiness")(spark, dir)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      got == expected
    }, minTests = 8)
  }
}
