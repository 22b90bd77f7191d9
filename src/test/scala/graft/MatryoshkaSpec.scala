package graft

/** Ground truth for q_emb_matryoshka: a planted corpus where the
  * 16-dim prefix DISAGREES with the full vector about the nearest
  * neighbor — the exact failure the audit exists to catch.
  */
class MatryoshkaSpec extends SparkSpecBase {
  import spark.implicits._

  test("planted prefix/suffix conflict: truncation flips the top-1") {
    // q = unit mass on dims 0 and 16. v1: tiny orthogonal prefix +
    // aligned suffix -> full cos ~.707, trunc cos 0. v2: aligned
    // prefix + OPPOSED suffix -> full cos 0, trunc cos 1.
    def vec(entries: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(64)(0f)
      entries.foreach { case (i, v) => a(i) = v }
      a.toSeq
    }
    val dir = java.nio.file.Files.createTempDirectory("mat_fix").toString
    Seq(
      (0L, vec(0 -> 1f, 16 -> 1f), 0),
      (1L, vec(1 -> 0.001f, 16 -> 1f), 0),
      (2L, vec(0 -> 1f, 16 -> -1f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_emb_matryoshka")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getInt(5), r.getBoolean(6)))).toMap
    val (fullTop1, truncTop1, fullRankOfTrunc, agree) = out(0L)
    assert(fullTop1 == 1L, "full cosine must pick the suffix-aligned vector")
    assert(truncTop1 == 2L, "truncated cosine must pick the prefix-aligned vector")
    assert(fullRankOfTrunc == 2 && !agree)
  }

  test("corpus: full_rank_of_trunc is 1 exactly when the audit agrees") {
    val rows = SparkEntry.queries("q_emb_matryoshka")(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getBoolean(6) == (r.getInt(5) == 1))
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
    }
  }
}
