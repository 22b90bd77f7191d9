package graft

/** Ground truth for q_doc_vocab_coverage: exact head sizes on a planted
  * Zipf-ish distribution (including the crossing-type and the
  * exactly-at-threshold exclusion), and corpus monotonicity.
  */
class VocabCoverageSpec extends SparkSpecBase {
  import spark.implicits._

  /** Term counts a:50 b:30 c:15 d:4 e:1 (total 100). Heads: 50% → {a};
    * 90% → {a,b,c}; 99% → {a,b,c,d} — e sits at cumulative 99 exactly,
    * 99·100 < 100·99 is false, so it is excluded.
    */
  private lazy val plantedDir: String = {
    val text = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(15)("c") ++
      Seq.fill(4)("d") ++ Seq("e")).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("vocabcov_fix").toString
    Seq((0L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted zipf: exact head sizes, at-threshold type excluded") {
    val out = SparkEntry.queries("q_doc_vocab_coverage")(spark, plantedDir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(50 -> 1L, 90 -> 3L, 99 -> 4L))
  }

  test("corpus run: three rows, head sizes monotone and bounded by the vocabulary") {
    val rows = SparkEntry.queries("q_doc_vocab_coverage")(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    assert(rows.map(_._1).toSeq == Seq(50, 90, 99))
    val ns = rows.map(_._2)
    assert(ns(0) <= ns(1) && ns(1) <= ns(2), "coverage heads must nest")
    val vocab = graft.sources.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.tokens(
          org.apache.spark.sql.functions.col("text"))).as("t"))
      .distinct().count()
    assert(ns(2) <= vocab)
    assert(ns(0) >= 1L)
  }
}
