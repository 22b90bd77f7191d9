package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_doc_doremi_weights: on a planted easy/hard split
  * the hard (high-surprisal) domain is up-weighted from uniform and the
  * easy domain donates mass; weights are a distribution; the update is
  * order-preserving in mean surprisal.
  */
class DoremiWeightsSpec extends SparkSpecBase {
  import spark.implicits._

  /** src_easy: every doc is the same common token repeated (minimal
    * surprisal — the corpus vocab is dominated by it). src_hard: every
    * token unique across the corpus (maximal surprisal).
    */
  private lazy val plantedDir: String = {
    val easy = (0 until 10).map { i =>
      (i.toLong, Seq.fill(20)("common").mkString(" "), "en", "src_easy", 100L)
    }
    val hard = (10 until 20).map { i =>
      (i.toLong, (0 until 20).map(j => s"rare_${i}_$j").mkString(" "), "en", "src_hard", 100L)
    }
    val dir = java.nio.file.Files.createTempDirectory("doremi_fix").toString
    (easy ++ hard).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("hard domain is boosted above uniform, easy domain below; weights sum to 1") {
    val out = SparkEntry.queries("q_doc_doremi_weights")(spark, plantedDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val (easyMean, easyExcess, easyW) = out("src_easy")
    val (hardMean, hardExcess, hardW) = out("src_hard")
    assert(hardMean > easyMean, "unique tokens must out-surprise the common token")
    assert(easyExcess == 0.0, "at-or-below-average domains have zero clipped excess")
    assert(hardExcess > 0.0)
    assert(hardW > 0.5 && easyW < 0.5,
      s"uniform baseline is 1/2; got easy=$easyW hard=$hardW")
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-12)
  }

  test("corpus run: a proper distribution ordered consistently with excess") {
    val rows = SparkEntry.queries("q_doc_doremi_weights")(spark, sfDir).collect()
    val wSum = rows.map(_.getDouble(5)).sum
    assert(math.abs(wSum - 1.0) < 1e-9, s"weights must normalize: $wSum")
    assert(rows.forall(_.getDouble(5) > 0.0))
    // linearized MW is monotone: more excess, more weight
    val byExcess = rows.sortBy(_.getDouble(4)).map(_.getDouble(5))
    assert(byExcess.zip(byExcess.tail).forall { case (a, b) => a <= b })
    // n_docs/n_tokens accounting covers the whole corpus
    val nDocs = rows.map(_.getLong(1)).sum
    assert(nDocs == graft.sources.Tables.documents(spark, sfDir).count())
  }
}
