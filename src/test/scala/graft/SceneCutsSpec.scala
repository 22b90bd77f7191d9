package graft

import org.apache.spark.sql.functions._

import graft.queries.MultimodalQ

/** Ground truth for q_media_scene_cuts: the detected cut set must equal
  * the PLANTED cut set exactly — every scene transition flagged (the
  * fixture's cross-scene hashes are pseudo-random-far) and no
  * intra-scene jitter ever crossing the threshold (the one-pixel
  * per-frame perturbation moves at most two gradient bits).
  */
class SceneCutsSpec extends SparkSpecBase {

  /** The fixture's cut predicate, replayed independently. */
  private def plantedCuts(docId: Long): Seq[Long] =
    (1 until 6).collect { case f if (docId + 37L * f) % 3 == 0 => f.toLong }

  test("detected cuts equal the planted transition set — full recall, zero false positives") {
    val out = SparkEntry.queries("q_media_scene_cuts")(spark, sfDir)
      .select("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val vids = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 6 === 4).select("doc_id")
      .collect().map(_.getLong(0))
    assert(vids.nonEmpty)
    val planted = vids.flatMap(d => plantedCuts(d).map(f => (d, f))).toSet
    assert(out == planted,
      s"missed: ${(planted -- out).take(5)}; spurious: ${(out -- planted).take(5)}")
  }

  test("cut distances are far and non-cut distances near (threshold margin)") {
    val rows = SparkEntry.queries("q_media_scene_cuts")(spark, sfDir).collect()
    rows.foreach(r => assert(r.getInt(2) >= 10,
      s"a detected cut at hamming ${r.getInt(2)} has no margin over the 3 threshold"))
  }

  test("intra-scene jitter moves at most two gradient bits") {
    // frames 0..5 of a cut-free prefix: doc 4 has its first cut where
    // (4 + 37f) % 3 = 0 -> f = 2, so frames 0-1 share a scene
    val h0 = MultimodalQ.dhash64(MultimodalQ.dhW,
      MultimodalQ.sceneCutPixels(4L, 0))
    val h1 = MultimodalQ.dhash64(MultimodalQ.dhW,
      MultimodalQ.sceneCutPixels(4L, 1))
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 2)
  }

  test("plan: frame explode fused in the scan, one per-video window, no joins") {
    val p = SparkEntry.queries("q_media_scene_cuts")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"scene cuts must be join-free:\n$p")
    assert(!p.contains("SinglePartition"), "the lag window must partition by doc_id")
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("doc_id")), winLines.mkString("\n"))
  }
}
