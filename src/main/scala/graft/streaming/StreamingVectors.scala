package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingest for the persistent vector index — the embedding
  * twin of the text side's band-index growth (r13 verdict #8): an
  * unbounded (vec_id, embedding) stream grows the materialized coded
  * IVF-PQ index ([[graft.sink.VectorIndex]]) batch over batch, with
  * ZERO streaming state — the index is the state, durable and shared
  * with every batch consumer, exactly the [[StreamingDocs]] contract.
  *
  * Each micro-batch runs [[graft.sink.VectorIndex.appendCodedIdempotent]]:
  * encode against the stored (fixed) kernels, anti-join vec_ids already
  * present in the target lists, append preserving the bucket spec. A
  * checkpointed restart that re-fires an epoch therefore appends
  * nothing — StreamingVectorIndexSpec pins streamed-appends ==
  * one-shot build AND the replay no-op.
  */
object StreamingVectors {

  /** Wire an embedding stream into the coded index. The index (and its
    * centroid/codebook tables) must exist — streaming ingest GROWS an
    * index, it never trains one (training is a batch decision over a
    * representative corpus; the FAISS growth contract).
    */
  def indexAppendStream(emb: DataFrame, table: String,
                        checkpoint: String): StreamingQuery =
    emb.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, _: Long) =>
        graft.sink.VectorIndex.appendCodedIdempotent(b.sparkSession, table, b)
      }
      .start()
}
