package graft

/** Ground truth for q_doc_pii_stats: exact hit counts and carrying-doc
  * permille on planted PII, zeros on clean sources, corpus bounds.
  * Every output column is exact int64 (the ratio is integer permille,
  * floor division) so the result replays bit-identically across
  * engines — no DOUBLE→DECIMAL rounding surface.
  */
class PiiStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val plantedDir: String = {
    val hot = "mail a@b.com and c.d@e.org plus http://x.io/page here"
    val clean1 = "no addresses in this text at all"
    val clean2 = "nothing here either just words"
    val rows = Seq(
      (0L, hot, "en", "srcA", hot.length.toLong),
      (1L, clean1, "en", "srcA", clean1.length.toLong),
      (2L, clean2, "en", "srcB", clean2.length.toLong))
    val dir = java.nio.file.Files.createTempDirectory("piistats_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted sources: exact email/url totals and carrying-doc permille") {
    val out = SparkEntry.queries("q_doc_pii_stats")(spark, plantedDir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))).toMap
    assert(out("srcA") == ((2L, 1L, 2L, 1L, 500L)))
    assert(out("srcB") == ((1L, 0L, 0L, 0L, 0L)))
  }

  test("pii_permille is exact int64 floor division, not a rounded decimal") {
    import org.apache.spark.sql.types.LongType
    val df = SparkEntry.queries("q_doc_pii_stats")(spark, plantedDir)
    assert(df.schema("pii_permille").dataType == LongType)
    assert(df.schema("n_pii_docs").dataType == LongType)
    // a third of three docs floors to exactly 333 — no tie-rounding surface
    val thirdDir = {
      val hot = "mail a@b.com here"
      val rows = Seq(
        (0L, hot, "en", "srcC", hot.length.toLong),
        (1L, "clean", "en", "srcC", 5L),
        (2L, "clean too", "en", "srcC", 9L))
      val dir = java.nio.file.Files.createTempDirectory("piistats_q").toString
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val row = SparkEntry.queries("q_doc_pii_stats")(spark, thirdDir)
      .collect().head
    assert(row.getLong(4) == 1L && row.getLong(5) == 333L)
  }

  test("url whitespace class is explicit: vertical tab terminates a URL on both engines") {
    // java \s includes \x0b, RE2's does not — the explicit [^ \x09-\x0d]
    // class must stop the URL at the VT so both engines count one hit
    // with identical extent.
    val vt = "see http://a.io/p\u000btrailing and no more"
    val dir = java.nio.file.Files.createTempDirectory("piistats_vt").toString
    Seq((0L, vt, "en", "srcV", vt.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q_doc_pii_stats")(spark, dir).collect().head
    assert(r.getString(0) == "srcV" && r.getLong(2) == 1L && r.getLong(4) == 1L)
  }

  test("corpus run: one row per source, permille bounded, counts non-negative") {
    val rows = SparkEntry.queries("q_doc_pii_stats")(spark, sfDir).collect()
    val nsrc = graft.sources.Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(rows.length.toLong == nsrc)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L)
      assert(r.getLong(2) >= 0L && r.getLong(3) >= 0L)
      assert(r.getLong(4) >= 0L && r.getLong(4) <= r.getLong(1))
      val pm = r.getLong(5)
      assert(pm >= 0L && pm <= 1000L)
    }
  }
}
