package graft

/** Ground truth for q_doc_selfdedup_lines: first-occurrence keep order
  * on planted boilerplate, no-op on unique lines, and local-recompute
  * parity on the corpus.
  */
class SelfDedupLinesSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val plantedDir: String = {
    val boiler = Seq("nav", "body one", "nav", "body two", "nav").mkString("\n")
    val uniq = Seq("alpha", "beta", "gamma").mkString("\n")
    val blanks = Seq("a", "", "", "b", "").mkString("\n")
    val rows = Seq(
      (0L, boiler, "en", "s", boiler.length.toLong),
      (1L, uniq, "en", "s", uniq.length.toLong),
      (2L, blanks, "en", "s", blanks.length.toLong))
    val dir = java.nio.file.Files.createTempDirectory("selfdedup_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted docs: repeats collapse to first occurrence, order preserved, uniques untouched") {
    val out = SparkEntry.queries("q_doc_selfdedup_lines")(spark, plantedDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(0L) == ((5L, 3L, "nav\nbody one\nbody two")))
    assert(out(1L) == ((3L, 3L, "alpha\nbeta\ngamma")))
    // repeated blank lines are exact repeats too
    assert(out(2L) == ((5L, 3L, "a\n\nb")))
  }

  test("corpus run: engine output equals a local first-occurrence recompute") {
    val rows = SparkEntry.queries("q_doc_selfdedup_lines")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val lines = texts(r.getLong(0)).split("\n", -1)
      val kept = lines.zipWithIndex
        .filter { case (l, i) => lines.indexOf(l) == i }
        .map(_._1)
      assert(r.getLong(1) == lines.length.toLong)
      assert(r.getLong(2) == kept.length.toLong)
      assert(r.getString(3) == kept.mkString("\n"))
    }
  }
}
