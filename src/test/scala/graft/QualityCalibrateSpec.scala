package graft

/** Ground truth for q_doc_quality_calibrate: planted ratios map to the
  * exact per-source percentiles, single-doc sources calibrate to NULL,
  * and percentiles always span [0, 1] within a multi-doc source.
  */
class QualityCalibrateSpec extends SparkSpecBase {
  import spark.implicits._

  /** src_m: stopword ratios 2/4 (doc 0), 1/4 (doc 1), 0/4 (doc 2) →
    * quality order 0 > 1 > 2 → percentiles 0, 0.5, 1. src_1: one doc →
    * NULL.
    */
  private lazy val plantedDir: String = {
    val rows = Seq(
      (0L, "the and w1 w2", "en", "src_m", 14L),
      (1L, "the w1 w2 w3", "en", "src_m", 12L),
      (2L, "w1 w2 w3 w4", "en", "src_m", 11L),
      (3L, "anything at all here", "en", "src_1", 20L))
    val dir = java.nio.file.Files.createTempDirectory("qcal_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted ratios: percentiles 0 / 0.5 / 1; single-doc source NULL") {
    val out = SparkEntry.queries("q_doc_quality_calibrate")(spark, plantedDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getDouble(2) == 0.5 && out(0L).getDouble(3) == 0.0)
    assert(out(1L).getDouble(3) == 0.5)
    assert(out(2L).getDouble(2) == 0.0 && out(2L).getDouble(3) == 1.0)
    assert(out(3L).isNullAt(3), "no spread -> no calibration")
  }

  test("corpus run: per-source percentiles span [0,1] and rank-order the scores") {
    val rows = SparkEntry.queries("q_doc_quality_calibrate")(spark, sfDir)
      .collect().map(r => (r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val pcts = g.flatMap(_._3)
      if (g.length > 1) {
        assert(pcts.min == 0.0 && pcts.max == 1.0)
        // higher score -> lower percentile (descending rank)
        val sorted = g.sortBy(x => x._3.get)
        assert(sorted.zip(sorted.tail).forall { case (a, b) => a._2 >= b._2 })
      }
    }
  }
}
