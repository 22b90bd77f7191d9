package graft

/** Ground truth for q_doc_c4_rules: line survival (terminal
  * punctuation, ≥3 words, no javascript), page markers (lorem ipsum,
  * curly brace), and the ≥3-surviving-lines page gate.
  */
class C4RulesSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val plantedDir: String = {
    val good = "this line ends with a period."
    val rows = Seq(
      // 3 good lines + junk -> keep
      (0L, Seq(good, "does it end well? yes it does.", "a third good line.",
        "no punctuation here", "too short.").mkString("\n"), "en", "s", 100L),
      // only 2 good lines -> drop
      (1L, Seq(good, "another good line here.", "short.").mkString("\n"), "en", "s", 60L),
      // lorem ipsum marker -> drop even with 3 good lines
      (2L, Seq(good, good, good, "Lorem Ipsum dolor sit amet.").mkString("\n"), "en", "s", 90L),
      // brace marker -> drop
      (3L, Seq(good, good, good, "function() { return; }").mkString("\n"), "en", "s", 90L),
      // javascript line doesn't survive, leaving 2 -> drop
      (4L, Seq(good, good, "please enable JavaScript to continue.").mkString("\n"), "en", "s", 80L))
    val dir = java.nio.file.Files.createTempDirectory("c4_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted pages: line rules and page gates fire exactly as specified") {
    val out = SparkEntry.queries("q_doc_c4_rules")(spark, plantedDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5))).toMap
    assert(out(0L) == ((5L, 3L, false, false, true)))
    assert(out(1L) == ((3L, 2L, false, false, false)))
    assert(out(2L)._5 == false && out(2L)._3 == true, "lorem marker kills the page")
    assert(out(3L)._5 == false && out(3L)._4 == true, "brace marker kills the page")
    assert(out(4L) == ((3L, 2L, false, false, false)), "javascript line dropped")
  }

  test("corpus run: keep implies >=3 kept lines and no markers") {
    val rows = SparkEntry.queries("q_doc_c4_rules")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nl, nk, lor, br, keep) =
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))
      assert(nk <= nl)
      assert(keep == (nk >= 3 && !lor && !br))
    }
  }
}
