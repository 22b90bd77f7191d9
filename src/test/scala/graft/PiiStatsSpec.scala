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
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDecimal(4).doubleValue))).toMap
    assert(out("srcA") == ((2L, 1L, 2L, 0.5)))
    assert(out("srcB") == ((1L, 0L, 0L, 0.0)))
  }

  test("pii_doc_frac is quantized DECIMAL(18,6), not a raw double") {
    import org.apache.spark.sql.types.DecimalType
    val df = SparkEntry.queries("q_doc_pii_stats")(spark, plantedDir)
    assert(df.schema("pii_doc_frac").dataType == DecimalType(18, 6))
    // a third of three docs: 1/3 quantizes HALF_UP to exactly 0.333333
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
    val frac = SparkEntry.queries("q_doc_pii_stats")(spark, thirdDir)
      .collect().head.getDecimal(4)
    assert(frac == new java.math.BigDecimal("0.333333"))
  }

  test("corpus run: one row per source, fractions bounded, counts non-negative") {
    val rows = SparkEntry.queries("q_doc_pii_stats")(spark, sfDir).collect()
    val nsrc = graft.sources.Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(rows.length.toLong == nsrc)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L)
      assert(r.getLong(2) >= 0L && r.getLong(3) >= 0L)
      val frac = r.getDecimal(4).doubleValue
      assert(frac >= 0.0 && frac <= 1.0)
    }
  }
}
