package graft

/** Ground truth for q_doc_simhash_accuracy: identical texts land at
  * hamming 0 / estimate 1, the estimate is the exact affine map of
  * hamming, and the audited pair set is exactly the jaccard near-dup
  * pair set.
  */
class SimhashAccuracySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val plantedDir: String = {
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val near = (1 to 18).map(i => s"tok$i").mkString(" ") + " other words"
    val rows = Seq(
      (0L, base, "en", "s", 100L),
      (1L, base, "en", "s", 100L),            // exact duplicate of 0
      (2L, near, "en", "s", 100L),            // near-dup of 0/1
      (3L, (100 to 120).map(i => s"z$i").mkString(" "), "en", "s", 100L))
    val dir = java.nio.file.Files.createTempDirectory("shacc_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted duplicates: identical text -> hamming 0, estimate 1; near-dups bounded") {
    val out = SparkEntry.queries("q_doc_simhash_accuracy")(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    val (j01, h01, e01) = out((0L, 1L))
    assert(j01 == 1.0 && h01 == 0L && e01 == 1.0)
    out.foreach { case (_, (j, h, e)) =>
      assert(h >= 0L && h <= 64L)
      assert(e == 1.0 - h / 64.0)
      assert(j >= 0.5, "only near-dup pairs are audited")
    }
    assert(out.contains((0L, 2L)) && out.contains((1L, 2L)))
  }

  test("corpus run: audited pairs == jaccard near-dup pairs, estimates affine in hamming") {
    val acc = SparkEntry.queries("q_doc_simhash_accuracy")(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3), r.getDouble(4)))
    val jac = SparkEntry.queries("q_doc_ngram_jaccard")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(acc.map(_._1).toSet == jac)
    acc.foreach { case (_, h, e) => assert(e == 1.0 - h / 64.0) }
  }
}
