package graft

/** Ground truth for q_doc_softdedup: exact inverse-multiplicity weights
  * on a planted duplicate cluster, conservation of effective mass, and
  * corpus-level invariants.
  */
class SoftDedupSpec extends SparkSpecBase {
  import spark.implicits._

  /** doc_ids 0-2 are byte-identical (one 3-cluster); 3 and 4 unique. */
  private lazy val plantedDir: String = {
    val rows = Seq(
      (0L, "alpha beta gamma", "en", "s1", 16L),
      (1L, "alpha beta gamma", "en", "s1", 16L),
      (2L, "alpha beta gamma", "en", "s2", 16L),
      (3L, "delta epsilon", "en", "s1", 13L),
      (4L, "zeta eta theta iota", "en", "s2", 19L))
    val dir = java.nio.file.Files.createTempDirectory("softdedup_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted cluster: every copy kept at weight 1/3, uniques at 1.0") {
    val out = SparkEntry.queries("q_doc_softdedup")(spark, plantedDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L), "all docs survive")
    Seq(0L, 1L, 2L).foreach { id =>
      assert(out(id) == ((3L, 1.0 / 3.0, 16.0 / 3.0)))
    }
    assert(out(3L) == ((1L, 1.0, 13.0)))
    assert(out(4L) == ((1L, 1.0, 19.0)))
    // conservation: effective char mass == one copy's worth per cluster
    val eff = out.values.map(_._3).sum
    assert(math.abs(eff - (16.0 + 13.0 + 19.0)) < 1e-9)
  }

  test("corpus run: full coverage, weight == 1/n_copies, weights in (0,1]") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val rows = SparkEntry.queries("q_doc_softdedup")(spark, sfDir).collect()
    assert(rows.length == docs.count().toInt, "soft dedup never drops rows")
    rows.foreach { r =>
      val (n, w) = (r.getLong(1), r.getDouble(2))
      assert(n >= 1L)
      assert(w == 1.0 / n.toDouble)
      assert(w > 0.0 && w <= 1.0)
    }
  }
}
