package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the multimodal batch operators.
  *
  * The decode/dHash half of the media pipeline is stateless per frame
  * (it fuses into whatever scan or source feeds it), so the streaming
  * surface here is the TEMPORAL part only: the operators that compare
  * a frame against its predecessor.
  */
object StreamingMedia {

  /** One decoded frame on the wire: the (video, index) key plus its
    * 64-bit perceptual hash — the stateless decode+dHash stage emits
    * exactly this row shape upstream.
    */
  final case class FrameEv(doc_id: Long, frame_idx: Int, dh: Long)

  /** One detected shot boundary (same row the batch query emits). */
  final case class CutOut(doc_id: Long, frame_idx: Long, hamming: Int)

  /** Per-video carry: the last frame seen (index + hash). */
  final case class FrameState(lastIdx: Int, lastDh: Long)

  /** Streaming SCENE-CUT DETECTION — the q_media_scene_cuts twin: per
    * video, compare each arriving frame's dHash against the PREVIOUS
    * SEEN frame (exactly the batch query's lag over frame order — if
    * sampling skipped indices, both forms compare across the gap) and
    * emit a cut row when the Hamming distance exceeds `threshold`.
    *
    * Arrival contract (same as the debounce/SCD2 streams document):
    * within-batch disorder is sorted out locally; cross-batch order
    * must be frame-index monotone per video — a frame decoder emits
    * frames in order by construction. A re-delivered frame at or
    * before the carried index is a no-op WHILE the video's state
    * lives; once the final frame expires the state, a later replay of
    * that video re-seeds it and can re-emit its tail cuts — the
    * deliberate price of self-expiring state (the alternative, state
    * for every video ever seen, is the unbounded-state leak this
    * operator exists to avoid). Exactly-once sinks under an
    * at-least-once source should therefore key on (doc_id, frame_idx)
    * — cut rows are deterministic, so the replayed row is identical
    * and idempotent upserts absorb it.
    *
    * State is O(active videos) × one (int, long) record, and — unlike
    * the SCD2 dimension state — self-expiring: the container metadata
    * says how many frames a video has ([[graft.queries.MultimodalQ
    * .sceneFrames]] for the fixture corpus), so the final frame
    * REMOVES the video's state in the same flush that consumes it. A
    * stream of a billion videos holds state only for the videos
    * currently mid-flight.
    */
  def sceneCutStream(frames: Dataset[FrameEv],
                     framesPerVideo: Int,
                     threshold: Int = 3): Dataset[CutOut] = {
    import frames.sparkSession.implicits._

    def flush(doc: Long, rows: Iterator[FrameEv],
              state: GroupState[FrameState]): Iterator[CutOut] = {
      val sorted = rows.toIndexedSeq.sortBy(_.frame_idx)
      val out = scala.collection.mutable.ArrayBuffer.empty[CutOut]
      var st = state.getOption
      sorted.foreach { f =>
        st match {
          case Some(s) if f.frame_idx > s.lastIdx =>
            val ham = java.lang.Long.bitCount(s.lastDh ^ f.dh)
            if (ham > threshold) out += CutOut(doc, f.frame_idx.toLong, ham)
            st = Some(FrameState(f.frame_idx, f.dh))
          case None =>
            st = Some(FrameState(f.frame_idx, f.dh))
          case _ => () // duplicate / late re-delivery: no-op
        }
      }
      if (st.exists(_.lastIdx >= framesPerVideo - 1)) state.remove()
      else st.foreach(state.update)
      out.iterator
    }

    frames
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(flush)
  }
}
