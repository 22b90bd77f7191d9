package graft

import org.apache.spark.sql.Row

import graft.queries.SimilarityQ

/** Ground truth for the no-oracle q_ann_lsh: recall of the LSH-banded
  * ANN path against the exact brute-force top-k on the same data
  * (the contract stated in SimilarityQ's doc).
  */
class AnnRecallSpec extends SparkSpecBase {

  private def neighborSets(rows: Array[Row]): Map[Long, Set[Long]] =
    rows.groupBy(_.getLong(0)).map { case (q, rs) =>
      q -> rs.map(_.getLong(1)).toSet
    }

  test("q_ann_lsh recall@10 vs q_ann_bruteforce") {
    val exact = neighborSets(
      SparkEntry.queries("q_ann_bruteforce")(spark, sfDir)
        .select("query_id", "neighbor_id").collect())
    val approx = neighborSets(
      SparkEntry.queries("q_ann_lsh")(spark, sfDir)
        .select("query_id", "neighbor_id").collect())
    assert(exact.nonEmpty, "brute-force baseline returned no neighbors")
    val recalls = exact.map { case (q, truth) =>
      val got = approx.getOrElse(q, Set.empty)
      got.intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // Banded LSH (16 bands × 4 hyperplanes) on near-uniform random
    // vectors: measured mean recall ~0.9 at this SF; 0.6 leaves margin
    // for the unfavorable geometry (true neighbors at cosine ≈ 0.3-0.5).
    assert(mean >= 0.6, s"mean recall@10 $mean < 0.6 (per-query: $recalls)")
  }

  test("q_ann_lsh scores are exact for returned neighbors") {
    // the rerank is exact cosine → any (query, neighbor) the LSH path
    // returns must carry the same score brute force computed for it
    val exact = SparkEntry.queries("q_ann_bruteforce")(spark, sfDir)
      .select("query_id", "neighbor_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val approx = SparkEntry.queries("q_ann_lsh")(spark, sfDir)
      .select("query_id", "neighbor_id", "score").collect()
    val checked = approx.flatMap { r =>
      exact.get((r.getLong(0), r.getLong(1))).map(e => (e, r.getDouble(2)))
    }
    assert(checked.nonEmpty)
    checked.foreach { case (e, a) => assert(e == a, s"score mismatch: $e vs $a") }
  }

  test("int8 quantization reconstructs within the per-dim bound (mx-mn)/255") {
    import org.apache.spark.sql.functions._
    val codes = SparkEntry.queries("q_emb_quantize")(spark, sfDir)
    val exploded = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
    val stats = exploded.groupBy("dim")
      .agg(min("x").as("mn"), max("x").as("mx"))
    // dequantize with the bucket midpoint and check |x - xhat| <= w where
    // w = (mx-mn)/255 is the bucket width (midpoint guarantees w/2 for
    // interior buckets; the clamped top bucket still stays within w)
    val bad = codes.join(exploded, Seq("vec_id", "dim")).join(stats, "dim")
      .withColumn("w", (col("mx").cast("double") - col("mn").cast("double")) / 255.0)
      .withColumn("xhat", col("mn").cast("double") + (col("code").cast("double") + 0.5) * col("w"))
      .filter(abs(col("x").cast("double") - col("xhat")) > col("w"))
      .count()
    assert(bad == 0L, s"$bad values reconstruct outside the quantization bound")
    // codes use the full [0, 255] range on this corpus
    val r = codes.agg(min("code"), max("code")).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 255L, r.toString)
  }

  test("q_ann_quantized recall@10 vs q_ann_bruteforce (int8 index fidelity)") {
    val exact = neighborSets(
      SparkEntry.queries("q_ann_bruteforce")(spark, sfDir)
        .select("query_id", "neighbor_id").collect())
    val quant = neighborSets(
      SparkEntry.queries("q_ann_quantized")(spark, sfDir)
        .select("query_id", "neighbor_id").collect())
    assert(quant.keySet == exact.keySet, "every query must return results")
    // 64-dim int8 with per-dim scaling distorts cosine very little:
    // demand high recall, not the looser LSH bar
    val recalls = exact.map { case (q, e) =>
      quant(q).intersect(e).size.toDouble / e.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@10 $mean < 0.8 (per-query: $recalls)")
  }
}
