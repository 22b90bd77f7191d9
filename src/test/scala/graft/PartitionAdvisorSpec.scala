package graft

/** Ground truth for q_doc_partition_advisor: on a uniform-mass corpus
  * the boundaries land exactly where hand arithmetic puts them; on the
  * real corpus the induced ranges are mass-balanced.
  */
class PartitionAdvisorSpec extends SparkSpecBase {
  import spark.implicits._

  /** 8 docs of 10 chars each: total 80, threshold_i = ⌈80i/16⌉ = 5i,
    * boundary doc = ⌈i/2⌉ − 1 (cum of doc j is 10(j+1)).
    */
  private lazy val plantedDir: String = {
    val rows = (0L until 8L).map(i => (i, "x" * 10, "en", "s", 10L))
    val dir = java.nio.file.Files.createTempDirectory("padv_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted uniform masses: boundaries land on the hand-computed docs") {
    val out = SparkEntry.queries("q_doc_partition_advisor")(spark, plantedDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 15)
    out.foreach { case (i, doc, cum) =>
      assert(doc == (i + 1) / 2 - 1, s"boundary $i on doc $doc")
      assert(cum == (doc + 1) * 10)
    }
  }

  test("corpus run: 15 monotone boundaries inducing near-equal mass ranges") {
    val rows = SparkEntry.queries("q_doc_partition_advisor")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (1 to 15))
    val docs = rows.map(_._2)
    assert(docs.zip(docs.tail).forall { case (a, b) => a <= b }, "monotone")
    val total = spark.read.parquet(s"$sfDir/documents.parquet")
      .agg(org.apache.spark.sql.functions.sum("n_chars")).head.getLong(0)
    val cuts = 0L +: rows.map(_._3) :+ total
    val masses = cuts.zip(cuts.tail).map { case (a, b) => b - a }
    val ideal = total / 16.0
    // each range within one max-doc-size of ideal; crude bound: 3x ideal
    assert(masses.forall(m => m < 3 * ideal), s"unbalanced: $masses")
  }
}
