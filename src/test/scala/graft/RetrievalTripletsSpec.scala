package graft

/** Ground truth for q_doc_retrieval_triplets: the gold passage is the
  * query's own document, negatives are the best-scoring OTHER
  * passages (the DPR hard-negative recipe), and margins are
  * gold − negative in rank order.
  */
class RetrievalTripletsSpec extends SparkSpecBase {
  import spark.implicits._

  /** doc 0 is a query doc (qid < 5); docs 5/6 share most of its
    * terms (hard negatives), doc 7 shares nothing.
    */
  private lazy val plantedDir: String = {
    val rows = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 40L),
      (5L, "alpha beta gamma delta iota kappa unrelated filler", "en", "s", 40L),
      (6L, "alpha beta mu nu xi omicron pi rho", "en", "s", 40L),
      (7L, "completely different words here nothing shared at all", "en", "s", 50L))
    val dir = java.nio.file.Files.createTempDirectory("trip_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted corpus: gold is the query doc, negatives rank by shared terms") {
    val rows = SparkEntry.queries("q_doc_retrieval_triplets")(spark, plantedDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(0), "pos_doc_id is the gold (query) doc")
      assert(r.getLong(3) != r.getLong(0), "negatives exclude the gold")
      assert(r.getDouble(6) == r.getDouble(2) - r.getDouble(4), "margin = pos - neg")
      assert(r.getDouble(6) > 0.0, "gold outscores every negative here")
    }
    val negOrder = rows.filter(_.getLong(0) == 0L).map(_.getLong(3)).toSeq
    assert(negOrder.take(2) == Seq(5L, 6L),
      s"more shared terms -> harder negative first, got $negOrder")
    assert(!negOrder.contains(7L), "no-overlap doc never scores")
  }

  test("corpus run: per-query triplet contract holds") {
    val rows = SparkEntry.queries("q_doc_retrieval_triplets")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val perQ = rows.groupBy(_.getLong(0))
    perQ.foreach { case (_, g) =>
      assert(g.length <= 3)
      assert(g.map(_.getInt(5)).sorted.toSeq == (1 to g.length))
      // negatives are rank-ordered by descending score
      val scores = g.sortBy(_.getInt(5)).map(_.getDouble(4))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    rows.foreach(r => assert(r.getLong(1) == r.getLong(0)))
  }
}
