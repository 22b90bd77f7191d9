package graft

/** Ground truth for q_doc_zipf_slope: a planted geometric (Zipf-like)
  * distribution produces the hand-computed negative slope, a uniform
  * distribution is flat, and a single-point source degenerates to
  * NULL.
  */
class ZipfSlopeSpec extends SparkSpecBase {
  import spark.implicits._

  /** src_z: freqs 8/4/2/1 for a/b/c/d -> ranks 1..4, x = 1,2,2,3,
    * y = 4,3,2,1 -> slope = (4·17 − 8·10)/(4·18 − 64) = −12/8 = −1.5.
    * src_u: four terms once each -> y constant -> slope 0.
    * src_1: one term -> one point -> NULL slope.
    */
  private lazy val plantedDir: String = {
    val z = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++ Seq("d"))
      .mkString(" ")
    val rows = Seq(
      (0L, z, "en", "src_z", 40L),
      (1L, "p q r s", "en", "src_u", 10L),
      (2L, "only", "en", "src_1", 4L))
    val dir = java.nio.file.Files.createTempDirectory("zipf_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted distributions: geometric slope −1.5, uniform 0, single-point NULL") {
    val out = SparkEntry.queries("q_doc_zipf_slope")(spark, plantedDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("src_z").getLong(1) == 4L)
    assert(out("src_z").getDouble(2) == -1.5)
    assert(out("src_u").getDouble(2) == 0.0)
    assert(out("src_1").isNullAt(2), "one x point -> degenerate regression")
  }

  test("corpus run: every source slopes negative (frequency decays with rank)") {
    val rows = SparkEntry.queries("q_doc_zipf_slope")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      if (!r.isNullAt(2)) assert(r.getDouble(2) <= 0.0,
        s"${r.getString(0)}: rank-increasing frequency is impossible")
    }
  }
}
