package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.MultimodalQ
import graft.streaming.StreamingMedia
import graft.streaming.StreamingMedia.{CutOut, FrameEv}

/** Batch/stream parity for q_media_scene_cuts ↔ sceneCutStream: the
  * streamed cut rows must equal the batch query's output exactly —
  * including when the frame stream splits MID-VIDEO across
  * micro-batches (the per-video carry state bridges the split).
  */
class StreamingSceneCutsSpec extends SparkSpecBase {
  import spark.implicits._

  /** The fixture's frame stream: (doc_id, frame_idx, dh) for every
    * video doc, hashes computed with the same fixture arithmetic the
    * batch query round-trips through real PNG bytes.
    */
  private lazy val frames: IndexedSeq[FrameEv] = {
    val vids = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 6 === 4).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    for {
      d <- vids.toIndexedSeq
      f <- 0 until MultimodalQ.sceneFrames
    } yield FrameEv(d, f,
      MultimodalQ.dhash64(MultimodalQ.dhW, MultimodalQ.sceneCutPixels(d, f)))
  }

  private lazy val batchCuts: Set[(Long, Long, Int)] =
    SparkEntry.queries("q_media_scene_cuts")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def run(batches: Seq[Seq[FrameEv]], name: String): Set[(Long, Long, Int)] = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[FrameEv]
    val out = StreamingMedia.sceneCutStream(stream.toDS(), MultimodalQ.sceneFrames)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[CutOut]
      .collect().map(c => (c.doc_id, c.frame_idx, c.hamming)).toSet
  }

  test("single batch: streamed cuts equal the batch query exactly") {
    assert(batchCuts.nonEmpty)
    val streamed = run(Seq(frames), "scene_cut_parity_1")
    assert(streamed == batchCuts,
      s"missing=${(batchCuts -- streamed).take(3)} extra=${(streamed -- batchCuts).take(3)}")
  }

  test("mid-video micro-batch splits: carry state bridges the boundary") {
    // split by frame index: every video's frames 0-1 arrive in batch 1,
    // 2-3 in batch 2, 4-5 in batch 3 — every split lands mid-video
    val batches = Seq(
      frames.filter(_.frame_idx <= 1),
      frames.filter(f => f.frame_idx >= 2 && f.frame_idx <= 3),
      frames.filter(_.frame_idx >= 4))
    val streamed = run(batches, "scene_cut_parity_2")
    assert(streamed == batchCuts, "split-batch stream diverged from batch")
  }

  test("duplicate re-delivery before video completion is a no-op") {
    // frames 0-3, then 1-2 AGAIN (state carries lastIdx=3, so the
    // re-delivery is at-or-before the carried index), then the tail.
    // After completion the state is removed by design, so only
    // pre-completion re-delivery is covered by the no-op contract.
    val withDups = Seq(
      frames.filter(_.frame_idx <= 3),
      frames.filter(f => f.frame_idx >= 1 && f.frame_idx <= 2),
      frames.filter(_.frame_idx >= 4))
    val streamed = run(withDups, "scene_cut_parity_3")
    assert(streamed == batchCuts, "re-delivered frames must not re-emit cuts")
  }
}
