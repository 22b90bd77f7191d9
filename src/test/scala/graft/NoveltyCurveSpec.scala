package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_doc_novelty_curve: hand-computed novelty on a
  * planted ingest sequence, and the declining-marginal invariants on
  * the corpus.
  */
class NoveltyCurveSpec extends SparkSpecBase {
  import spark.implicits._

  /** doc 0 "a b c d" → shingles {abc, bcd}, both novel. doc 1 repeats
    * doc 0 verbatim → 2 grams, 0 novel. doc 500 (cohort 1)
    * "a b c x" → {abc, bcx}: abc seen, bcx novel → 1/2.
    */
  private lazy val plantedDir: String = {
    val rows = Seq(
      (0L, "a b c d"), (1L, "a b c d"), (500L, "a b c x"))
    val dir = java.nio.file.Files.createTempDirectory("novelty_fix").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted sequence: exact novel counts per cohort") {
    val out = SparkEntry.queries("q_doc_novelty_curve")(spark, plantedDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(0L) == ((4L, 2L, 0.5)), s"cohort 0: ${out(0L)}")
    assert(out(1L) == ((2L, 1L, 0.5)), s"cohort 1: ${out(1L)}")
  }

  test("corpus: first cohort is maximally novel; totals partition the gram mass") {
    val rows = SparkEntry.queries("q_doc_novelty_curve")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // every gram's first carrier is SOMEWHERE: novel totals equal the
    // distinct-gram count of the whole corpus
    val distinctGrams = rows.map(_.getLong(2)).sum
    val sh = graft.sources.Tables.documents(spark, sfDir)
      .select(split(lower(trim(col("text"))), "\\s+").as("t"))
      .filter(size(col("t")) >= 3)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"))
        .as("shingle"))
      .distinct().count()
    assert(distinctGrams == sh)
  }
}
