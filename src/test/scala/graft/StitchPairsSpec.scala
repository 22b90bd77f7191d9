package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_doc_stitch_pairs: a planted split document is
  * detected in the right direction (tail-of-A = head-of-B), short and
  * unrelated docs never pair, and corpus output respects the schema
  * contract.
  */
class StitchPairsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val plantedDir: String = {
    // doc 0 ends with a6..a10; doc 1 begins with a6..a10 -> stitch 0->1.
    // doc 2 shares no endpoints; doc 3 is too short to key.
    val rows = Seq(
      (0L, (1 to 10).map(i => s"a$i").mkString(" "), "en", "s", 40L),
      (1L, ((6 to 10).map(i => s"a$i") ++ (1 to 5).map(i => s"b$i")).mkString(" "), "en", "s", 40L),
      (2L, (1 to 10).map(i => s"z$i").mkString(" "), "en", "s", 40L),
      (3L, "tiny doc", "en", "s", 8L))
    val dir = java.nio.file.Files.createTempDirectory("stitch_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted split doc stitches tail-to-head, directionally") {
    val got = SparkEntry.queries("q_doc_stitch_pairs")(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 1L)),
      s"exactly the 0->1 continuation, got ${got.mkString(",")}")
  }

  test("corpus run: no self pairs, schema stable") {
    val df = SparkEntry.queries("q_doc_stitch_pairs")(spark, sfDir)
    assert(df.columns.toSeq == Seq("doc_a", "doc_b"))
    val rows = df.collect()
    rows.foreach(r => assert(r.getLong(0) != r.getLong(1)))
  }
}
