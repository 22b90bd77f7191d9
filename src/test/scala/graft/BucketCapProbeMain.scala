package graft

import org.apache.spark.sql.functions._

/** Manual probe (run with `Test/runMain graft.BucketCapProbeMain`):
  * re-times the two duplicate-heavy band-join worst cases after the
  * mega-bucket guard ([[graft.queries.SimilarityQ.maxBandBucket]]).
  * Pre-guard pins (BENCH_NOTES): knn_graph_10x 527 s (re-measured
  * 974 s), editdist_neardup_10x 89.2 s — both O(Σ bucket²).
  *
  * What the guard buys, per family (measured numbers in BENCH_NOTES
  * "Round 8: mega-bucket guard evidence"):
  *  - kNN graph: anchors uncapped × neighbors capped → pair space
  *    bucket × cap (974 → 38.5 s at 10× duplication). NOT same-order
  *    as the clean corpus — the per-anchor candidate set still grows
  *    with duplication — but linear, not quadratic, in bucket size.
  *  - editdist neardup (round-8 clique+star form): C(cap,2) clique
  *    + linear star tail per bucket → pair count is INDEPENDENT of
  *    bucket size past the cap, so the 10× run is expected
  *    same-order as clean (round-7's one-side cap was still
  *    bucket × cap = 63.5 s vs 0.66 s clean).
  */
object BucketCapProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sfDir = "/root/testdata/sf0.1"
    val bigDir = java.nio.file.Files.createTempDirectory("probecap").toString

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val n = docs.count()
    docs.crossJoin(spark.range(10).select(col("id").as("copy")))
      .select((col("doc_id") + col("copy") * n * 10).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$bigDir/documents.parquet")

    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val nEmb = emb.count()
    emb.crossJoin(spark.range(10).select(col("id").as("copy")))
      .select((col("vec_id") + col("copy") * nEmb * 10).as("vec_id"),
        col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$bigDir/embeddings.parquet")

    time(s"knn_graph_10x(${nEmb * 10} vecs, duplicate-heavy, capped)") {
      SparkEntry.queries("q_emb_knn_graph")(spark, bigDir).count()
    }
    time("editdist_neardup_10x(duplicate-heavy candidates, capped)") {
      SparkEntry.queries("q_doc_editdist_neardup")(spark, bigDir).count()
    }
    spark.stop()
  }
}
