package graft

/** Ground truth for q_doc_boilerplate_lines: df ≥ 3 lines vanish from
  * every document, df counts by DISTINCT docs (an in-doc repeat does
  * not inflate df), order-preserving reassembly, all-boilerplate docs
  * empty out, and local-recompute parity on the corpus.
  */
class BoilerplateLinesSpec extends SparkSpecBase {
  import spark.implicits._

  /** "FOOTER" in docs 0-3 (df 4 → removed everywhere); "RARE" twice in
    * doc 0 and once in doc 1 (df 2 — in-doc repeat doesn't count —
    * kept, both copies); unique bodies; doc 3 is footer-only.
    */
  private lazy val plantedDir: String = {
    val rows = Seq(
      (0L, "RARE\nbody zero\nFOOTER\nRARE", "en", "s", 30L),
      (1L, "body one\nRARE\nFOOTER", "en", "s", 20L),
      (2L, "body two\nFOOTER", "en", "s", 15L),
      (3L, "FOOTER", "en", "s", 6L))
    val dir = java.nio.file.Files.createTempDirectory("boiler_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted: df>=3 removed everywhere, distinct-doc df, empty-out, order kept") {
    val out = SparkEntry.queries("q_doc_boilerplate_lines")(spark, plantedDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(0L) == ((4L, 3L, "RARE\nbody zero\nRARE")))
    assert(out(1L) == ((3L, 2L, "body one\nRARE")))
    assert(out(2L) == ((2L, 1L, "body two")))
    assert(out(3L) == ((1L, 0L, "")))
  }

  test("corpus run: engine output equals a local recompute") {
    val rows = SparkEntry.queries("q_doc_boilerplate_lines")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val df = texts.values.toSeq
      .flatMap(t => t.split("\n", -1).distinct)
      .groupBy(identity).view.mapValues(_.size).toMap
    rows.foreach { r =>
      val lines = texts(r.getLong(0)).split("\n", -1)
      val kept = lines.filter(l => df(l) < 3)
      assert(r.getLong(1) == lines.length.toLong)
      assert(r.getLong(2) == kept.length.toLong)
      assert(r.getString(3) == kept.mkString("\n"))
    }
  }
}
