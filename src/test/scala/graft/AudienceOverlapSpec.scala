package graft

import java.sql.Timestamp

/** Ground truth for q_events_audience_overlap: below the sketch size
  * (union < k = 64) the KMV estimate degenerates to the exact overlap;
  * disjoint audiences estimate 0; on the corpus the estimate stays
  * inside the union bound.
  */
class AudienceOverlapSpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(id: Long, user: Long, typ: String) =
    (id, new Timestamp(1000000L + id * 1000), user, typ, 1.0, "{}")

  /** A: users 1-10, B: users 6-15 (overlap 5), C: users 100-101
    * (disjoint from both). All unions < 64 -> exact branch.
    */
  private lazy val plantedDir: String = {
    var id = -1L
    def next = { id += 1; id }
    val rows =
      (1L to 10L).map(u => ev(next, u, "A")) ++
      (6L to 15L).map(u => ev(next, u, "B")) ++
      (100L to 101L).map(u => ev(next, u, "C"))
    val dir = java.nio.file.Files.createTempDirectory("aud_fix").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("planted audiences: sub-k sketches are exact; disjoint pairs estimate 0") {
    val out = SparkEntry.queries("q_events_audience_overlap")(spark, plantedDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    val (exAB, unAB, estAB) = out(("A", "B"))
    assert(exAB == 5L)
    assert(unAB == 15.0, "sub-k union estimate is the exact union")
    assert(math.abs(estAB - 5.0) < 1e-9)
    val (exAC, _, estAC) = out(("A", "C"))
    assert(exAC == 0L && math.abs(estAC) < 1e-9)
  }

  test("corpus run: estimates bounded by the union estimate, all pairs present") {
    val rows = SparkEntry.queries("q_events_audience_overlap")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ex, un, est) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(ex >= 0L && un > 0.0 && est >= 0.0)
      assert(est <= un * (1.0 + 1e-12), "intersection cannot exceed the union")
    }
  }
}
