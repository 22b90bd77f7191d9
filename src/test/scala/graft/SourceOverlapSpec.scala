package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_doc_source_overlap: exact shared-shingle counts
  * and Jaccard on a planted three-source fixture with a known overlap
  * structure, plus symmetry/bounds sanity on the corpus fixture.
  */
class SourceOverlapSpec extends SparkSpecBase {
  import spark.implicits._

  /** src_x and src_y share exactly one 3-shingle ("common ground here"
    * appears in both); src_z shares nothing with either. Doc shingle
    * sets: x = {a b c, b c d, c d e}, plus the shared doc
    * {common ground here}; y = {common ground here, ground here too};
    * z = {zz1 zz2 zz3}.
    */
  private lazy val plantedDir: String = {
    val rows = Seq(
      (0L, "a b c d e", "en", "src_x", 9L),
      (1L, "common ground here", "en", "src_x", 18L),
      (2L, "common ground here too", "en", "src_y", 22L),
      (3L, "zz1 zz2 zz3", "en", "src_z", 11L))
    val dir = java.nio.file.Files.createTempDirectory("sovl_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted overlap: exactly one shared shingle between x and y, z pairs absent") {
    val out = SparkEntry.queries("q_doc_source_overlap")(spark, plantedDir).collect()
    assert(out.length == 1, "only the (src_x, src_y) pair shares a shingle")
    val r = out.head
    assert(r.getString(0) == "src_x" && r.getString(1) == "src_y")
    // x: {a b c, b c d, c d e, common ground here} = 4 distinct shingles
    // y: {common ground here, ground here too} = 2; shared = 1
    assert(r.getLong(2) == 1L && r.getLong(3) == 4L && r.getLong(4) == 2L)
    assert(r.getDouble(5) == 1.0 / 5.0)
  }

  test("corpus run: pairs are strictly ordered, jaccard in (0,1], shared <= min size") {
    val rows = SparkEntry.queries("q_doc_source_overlap")(spark, sfDir).collect()
    assert(rows.nonEmpty, "sf corpus has cross-source shingle overlap")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "src_a < src_b")
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
      val j = r.getDouble(5)
      assert(j > 0.0 && j <= 1.0)
    }
  }
}
