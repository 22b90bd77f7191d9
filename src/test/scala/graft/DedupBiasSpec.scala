package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_doc_dedup_bias: a planted source whose near-dup
  * cluster drops the stopword-rich (prose) copy shows a negative
  * kept-vs-dropped gap; sources with no dropped docs carry NULL
  * dropped ratios; count identities hold on the corpus.
  */
class DedupBiasSpec extends SparkSpecBase {
  import spark.implicits._

  /** src_m: docs 0/1 are near-identical 20-token docs (jaccard >= 0.5
    * cluster; keep-min drops doc 1), doc 0 stopword-free, doc 1 ends
    * in stopwords. src_c: one doc, never clustered.
    */
  private lazy val plantedDir: String = {
    val base = (1 to 18).map(i => s"w$i")
    val rows = Seq(
      (0L, (base ++ Seq("x1", "x2")).mkString(" "), "en", "src_m", 80L),
      (1L, (base ++ Seq("the", "and")).mkString(" "), "en", "src_m", 80L),
      (2L, (1 to 10).map(i => s"c$i").mkString(" "), "en", "src_c", 40L))
    val dir = java.nio.file.Files.createTempDirectory("dbias_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted cluster: the stopword-rich duplicate is the dropped mass") {
    val out = SparkEntry.queries("q_doc_dedup_bias")(spark, plantedDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val m = out("src_m")
    assert(m.getLong(1) == 1L && m.getLong(2) == 1L, "one kept, one dropped")
    assert(m.getDouble(3) == 0.0, "kept doc 0 has no stopwords")
    assert(m.getDouble(4) == 2.0 / 20.0, "dropped doc 1: 2 stopwords of 20")
    val c = out("src_c")
    assert(c.getLong(1) == 1L && c.getLong(2) == 0L)
    assert(c.isNullAt(4), "no dropped docs -> NULL dropped ratio")
  }

  test("corpus run: kept+dropped covers every source's docs, ratios bounded") {
    val rows = SparkEntry.queries("q_doc_dedup_bias")(spark, sfDir).collect()
    val perSource = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == perSource.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == perSource(r.getString(0)),
        s"kept+dropped must partition ${r.getString(0)}")
      if (!r.isNullAt(3)) assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      if (!r.isNullAt(4)) assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    assert(rows.map(_.getLong(2)).sum > 0, "sf corpus has near-dup drops")
  }
}
