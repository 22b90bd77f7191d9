package graft

/** Ground truth for q_emb_class_separation: on planted clusters the
  * overlapping label pair reports each other as nearest with a small
  * inter distance, the far label separates by orders of magnitude,
  * and intra compactness reflects the planted spread.
  */
class ClassSeparationSpec extends SparkSpecBase {
  import spark.implicits._

  private def vec(base: Float, jitter: Float): Array[Float] = {
    val a = Array.fill(64)(base)
    a(1) = base + jitter
    a
  }

  /** labels 0 and 2 occupy the same region (base 0.0), label 1 is far
    * away (base 1.0). Jitter makes codes spread inside a label.
    */
  private lazy val plantedDir: String = {
    val rows =
      (0 until 4).map(i => (i.toLong, vec(0.0f, 0.01f * i), 0)) ++
      (4 until 8).map(i => (i.toLong, vec(1.0f, 0.01f * (i - 4)), 1)) ++
      (8 until 12).map(i => (i.toLong, vec(0.0f, 0.01f * (i - 8)), 2))
    val dir = java.nio.file.Files.createTempDirectory("csep_fix").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("planted clusters: overlapping labels are mutual nearest, far label separates") {
    val out = SparkEntry.queries("q_emb_class_separation")(spark, plantedDir)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getInt(3), r.getLong(4))).toMap
    assert(out.keySet == Set(0, 1, 2))
    val (n0, _, near0, d0) = out(0)
    val (_, _, near2, d2) = out(2)
    assert(n0 == 4L)
    assert(near0 == 2 && near2 == 0, "co-located labels are mutual nearest")
    val (_, _, near1, d1) = out(1)
    assert(d1 > 100 * math.max(1L, d0), "far label separates by orders of magnitude")
    assert(near1 == 0 || near1 == 2)
  }

  test("corpus run: one row per label, nearest is never self, intra_msd >= 0") {
    val rows = SparkEntry.queries("q_emb_class_separation")(spark, sfDir).collect()
    val labels = rows.map(_.getInt(0))
    assert(labels.distinct.length == labels.length && rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(3) != r.getInt(0))
      assert(r.getDouble(2) >= 0.0)
      assert(r.getLong(4) >= 0L)
    }
  }
}
