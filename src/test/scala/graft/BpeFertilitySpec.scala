package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_doc_bpe_fertility: per-language sums must
  * reconcile exactly with the per-doc BPE counts (same merge table,
  * same encoder), and the ratios obey tokenizer-fertility bounds.
  */
class BpeFertilitySpec extends SparkSpecBase {

  test("language sums reconcile exactly with per-doc BPE counts") {
    val fert = SparkEntry.queries("q_doc_bpe_fertility")(spark, sfDir).collect()
    val perDoc = SparkEntry.queries("q_doc_token_count_bpe")(spark, sfDir)
      .agg(sum("n_words"), sum("n_tokens_bpe")).head()
    assert(fert.map(_.getLong(2)).sum == perDoc.getLong(0), "word mass")
    assert(fert.map(_.getLong(3)).sum == perDoc.getLong(1), "BPE token mass")
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(fert.map(_.getLong(1)).sum == nDocs, "every doc in exactly one lang")
  }

  test("fertility bounds: >= 1 token per word, chars per token positive and finite") {
    val rows = SparkEntry.queries("q_doc_bpe_fertility")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(5) >= 1.0,
        s"${r.getString(0)}: a word encodes to at least one BPE token")
      assert(r.getDouble(6) > 0.0 && !r.getDouble(6).isInfinite)
    }
  }
}
