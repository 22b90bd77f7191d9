package graft

import java.sql.Timestamp

/** Ground truth for q_events_kanonymity: cells under k=5 DISTINCT
  * users surface, well-populated cells don't, repeat rows by the same
  * user don't inflate k, and NaN values are excluded.
  */
class KAnonymitySpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(id: Long, user: Long, typ: String, v: Double) =
    (id, new Timestamp(86400L * 1000 * 100 + id), user, typ, v, "{}")

  /** Cell (A, bucket 1, day 100): 6 distinct users -> safe. Cell
    * (B, bucket 2, day 100): 2 users, one of them 5 times -> at risk
    * with n_users = 2. A NaN-valued type C row is excluded entirely.
    */
  private lazy val plantedDir: String = {
    val safe = (1L to 6L).map(u => ev(u, u, "A", 15.0))
    val risky = Seq(ev(10, 50, "B", 25.0)) ++
      (11L to 15L).map(i => ev(i, 51, "B", 25.0))
    val nan = Seq(ev(20, 60, "C", Double.NaN))
    val dir = java.nio.file.Files.createTempDirectory("kanon_fix").toString
    (safe ++ risky ++ nan)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("planted cells: only the under-k cell surfaces, with distinct-user count") {
    val out = SparkEntry.queries("q_events_kanonymity")(spark, plantedDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(out.toSeq == Seq(("B", 2L, 2L)),
      s"expected exactly the risky cell, got ${out.toSeq}")
  }

  test("corpus run: every reported cell is under k and counts distinct users") {
    val rows = SparkEntry.queries("q_events_kanonymity")(spark, sfDir).collect()
    rows.foreach(r => assert(r.getLong(3) >= 1L && r.getLong(3) < 5L))
  }

  /** l-diversity cells key on (bucket, day) with event_type sensitive:
    * bucket 1 holds 6 users all of type A (k passes, l = 1 -> flagged);
    * bucket 3 holds 5 users across 3 types (diverse -> silent);
    * bucket 2 holds 2 users (fails k first -> silent here, the
    * k-audit owns it).
    */
  private lazy val ldivDir: String = {
    val homogeneous = (1L to 6L).map(u => ev(u, u, "A", 15.0))
    val underK = Seq(ev(10, 50, "B", 25.0), ev(11, 51, "B", 25.0))
    val diverse = (20L to 24L).map(i =>
      ev(i, i, Seq("A", "B", "C")((i % 3).toInt), 35.0))
    val dir = java.nio.file.Files.createTempDirectory("ldiv_fix").toString
    (homogeneous ++ underK ++ diverse)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("l-diversity: only the k-anonymous homogeneous cell surfaces") {
    val out = SparkEntry.queries("q_events_ldiversity")(spark, ldivDir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 6L, 1L)),
      s"expected exactly the homogeneous k-passing cell, got ${out.toSeq}")
  }

  test("l-diversity corpus run: reported cells pass k but fail diversity") {
    val rows = SparkEntry.queries("q_events_ldiversity")(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(2) >= 5L, "must pass the k bar")
      assert(r.getLong(3) >= 1L && r.getLong(3) < 3L, "must fail the l bar")
    }
  }
}
