package graft

/** Ground truth for q_doc_minhash_accuracy: planted identical docs
  * must estimate exactly 1.0, and on the corpus the k=16 estimator
  * must track exact Jaccard within sampling error.
  */
class MinhashAccuracySpec extends SparkSpecBase {
  import spark.implicits._

  test("planted identical pair: all 16 components agree, estimate exactly 1.0") {
    val dir = java.nio.file.Files.createTempDirectory("mh_acc_fix").toString
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      (1L, text, "en", "a", text.length.toLong),
      (2L, text, "en", "a", text.length.toLong),
      (3L, "one two three four five six seven", "en", "a", 33L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_doc_minhash_accuracy")(spark, dir).collect()
    val ident = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    assert(ident.getDouble(2) == 1.0, "exact jaccard of identical docs")
    assert(ident.getLong(3) == 16L, "all k components must agree")
    assert(ident.getDouble(4) == 1.0 && ident.getDouble(5) == 0.0)
  }

  test("corpus: estimator tracks exact Jaccard within sampling error") {
    val rows = SparkEntry.queries("q_doc_minhash_accuracy")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (jac, m, est, err) =
        (r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5))
      assert(m >= 0L && m <= 16L)
      assert(est == m.toDouble / 16.0)
      assert(err == est - jac)
      // 2.8 sigma for a k=16 Bernoulli mean (SE <= 0.125)
      assert(math.abs(err) <= 0.35, s"estimator off by $err at jaccard $jac")
    }
    val meanAbs = rows.map(r => math.abs(r.getDouble(5))).sum / rows.length
    assert(meanAbs <= 0.15, s"mean |err| $meanAbs exceeds expected sampling error")
  }
}
