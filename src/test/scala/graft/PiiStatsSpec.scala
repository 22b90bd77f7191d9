package graft

/** Ground truth for q_doc_pii_stats: exact hit counts and document
  * fractions on planted PII, zeros on clean sources, corpus bounds.
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

  test("planted sources: exact email/url totals and carrying-doc fraction") {
    val out = SparkEntry.queries("q_doc_pii_stats")(spark, plantedDir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out("srcA") == ((2L, 1L, 2L, 0.5)))
    assert(out("srcB") == ((1L, 0L, 0L, 0.0)))
  }

  test("corpus run: one row per source, fractions bounded, counts non-negative") {
    val rows = SparkEntry.queries("q_doc_pii_stats")(spark, sfDir).collect()
    val nsrc = graft.sources.Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(rows.length.toLong == nsrc)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L)
      assert(r.getLong(2) >= 0L && r.getLong(3) >= 0L)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }
}
