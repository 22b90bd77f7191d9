package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_doc_ngram_diversity: exact type-token and
  * distinct-trigram ratios on a planted repetitive vs fully-varied
  * source pair, and corpus-level sanity bounds.
  */
class NgramDiversitySpec extends SparkSpecBase {
  import spark.implicits._

  /** src_repeat: 5 docs of the token "spam" × 20 (one type, one
    * distinct trigram). src_varied: 5 docs of 20 corpus-unique tokens
    * (every token and trigram distinct).
    */
  private lazy val plantedDir: String = {
    val rep = (0 until 5).map { i =>
      (i.toLong, Seq.fill(20)("spam").mkString(" "), "en", "src_repeat", 100L)
    }
    val varied = (5 until 10).map { i =>
      (i.toLong, (0 until 20).map(j => s"v_${i}_$j").mkString(" "), "en", "src_varied", 100L)
    }
    val dir = java.nio.file.Files.createTempDirectory("ndiv_fix").toString
    (rep ++ varied).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted ratios are exact: collapsed for the repeater, 1.0 for the varied source") {
    val out = SparkEntry.queries("q_doc_ngram_diversity")(spark, plantedDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    // 5 docs × 20 tokens; 18 trigrams per doc
    assert(out("src_repeat") == ((100L, 1L, 0.01, 90L, 1L, 1.0 / 90.0)))
    assert(out("src_varied") == ((100L, 100L, 1.0, 90L, 90L, 1.0)))
  }

  test("corpus run: ratios in (0,1], trigram types never exceed unigram pair bound") {
    val rows = SparkEntry.queries("q_doc_ngram_diversity")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ttr, d3) = (r.getDouble(3), r.getDouble(6))
      assert(ttr > 0.0 && ttr <= 1.0)
      assert(d3 > 0.0 && d3 <= 1.0)
      assert(r.getLong(2) <= r.getLong(1), "types <= tokens")
      assert(r.getLong(5) <= r.getLong(4), "trigram types <= trigrams")
    }
  }
}
