package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_doc_gopher_rules beyond the oracle: hand-built
  * documents that trip exactly one rule each, so every rule bit is
  * pinned independently (the corpus fixture only exercises whichever
  * rules its synthetic text happens to trip).
  */
class GopherRulesSpec extends SparkSpecBase {
  import spark.implicits._

  private val fn = SparkEntry.queries("q_doc_gopher_rules")

  /** A compliant base text: >50 words, mean length in [3,10], no
    * symbols/bullets/ellipses, alphabetic, 2 Gopher stopwords.
    */
  private val goodText: String =
    (Seq.fill(30)("the quick brown fox jumps over lazy dogs with vigor")
      ).mkString(" ")

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, Boolean)] = {
    val dir = java.nio.file.Files.createTempDirectory("gopher").toString
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(8))).toMap
  }

  test("each rule independently flips keep to false") {
    val out = run(Seq(
      0L -> goodText,                                     // all rules pass
      1L -> "too few words with the",                     // word count < 50
      2L -> goodText.replaceAll("\\bthe\\b", "### ###"),  // symbols + stops
      3L -> (0 until 60).map(i => s"- bullet line $i with the of")
        .mkString("\n"),                                  // >90% bullet lines
      4L -> (0 until 60).map(i => s"line number $i of the tale...")
        .mkString("\n"),                                  // >30% ellipsis ends
      5L -> (Seq.fill(60)("12345 67890").mkString(" ") + " the of"), // alpha<0.8
      6L -> Seq.fill(60)("lorem ipsum dolor sit amet").mkString(" ")) // 0 stops
    )
    assert(out(0L)._2, "compliant doc must keep")
    (1L to 6L).foreach(id => assert(!out(id)._2, s"doc $id must be dropped"))
  }

  test("measured values are exact on a constructed doc") {
    val text = "the cat and hat\n- item one\nplain end..."
    val out = fn(spark, {
      val dir = java.nio.file.Files.createTempDirectory("gopher2").toString
      Seq((0L, text, "en", "s", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }).collect().head
    // 9 words total: the cat and hat - item one plain end...
    assert(out.getLong(1) == 9L)
    // 3 lines: one bullet start, one ellipsis end
    assert(out.getDouble(4) == 1.0 / 3.0, "bullet_frac")
    assert(out.getDouble(5) == 1.0 / 3.0, "ellipsis_frac")
    // stopwords present: the, and -> 2 hits
    assert(out.getLong(7) == 2L)
  }

  test("corpus run is deterministic and every keep bit recomputes") {
    val a = fn(spark, sfDir).collect()
    val b = fn(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq && a.nonEmpty)
    a.foreach { r =>
      val expect = (r.getLong(1) >= 50 && r.getLong(1) <= 100000) &&
        (r.getDouble(2) >= 3.0 && r.getDouble(2) <= 10.0) &&
        r.getDouble(3) <= 0.1 && r.getDouble(4) < 0.9 &&
        r.getDouble(5) < 0.3 && r.getDouble(6) >= 0.8 && r.getLong(7) >= 2
      assert(r.getBoolean(8) == expect, s"keep mismatch at ${r.getLong(0)}")
    }
  }
}
