package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.queries.PipelineQ
import graft.functions.TextFunctions.tokens

/** Streaming document curation — the ingest-time form of the batch
  * q_doc_curate pipeline (normalize → quality gate → exact dedup),
  * for corpora that arrive continuously rather than as a static
  * snapshot. StreamingDocsSpec proves the retained set matches the
  * batch stages on a replayed fixture.
  *
  * Scale design: normalize + quality are per-row (fuse into the scan
  * of each micro-batch, no state); dedup is
  * `dropDuplicatesWithinWatermark` on the normalized-text hash, so
  * state is O(distinct docs within the watermark horizon) rather than
  * O(stream length) — the watermark is the knob trading replay-guard
  * span against state size. Shard packing stays batch-side: shard ids
  * depend on a global prefix sum, which is meaningless on an unbounded
  * stream (at ingest you'd pack per micro-batch epoch instead).
  *
  * Batch-parity caveat: `dropDuplicatesWithinWatermark` keeps the
  * FIRST-ARRIVING document per text_hash, while batch q_doc_curate
  * keeps MIN(doc_id). The two agree only when replay order matches
  * doc_id order (which StreamingDocsSpec's fixture replay guarantees
  * by construction); out-of-order ingest of a duplicate group may
  * retain a different — equally valid — representative than the batch
  * run. Callers needing batch-identical survivors must either ingest
  * in doc_id order or reconcile representatives in a batch compaction.
  */
object StreamingDocs {

  /** Curate a document stream. Input columns: doc_id, text, and
    * `ingest_ts` (TimestampType event time). Emits
    * (doc_id, ingest_ts, norm_text, n_tokens) for documents that pass
    * the quality gate, first-arrival-wins per normalized text.
    */
  def curateStream(docs: DataFrame,
                   minTokens: Long = PipelineQ.curateMinTokens,
                   maxPunctRatio: Double = PipelineQ.curateMaxPunctRatio,
                   watermarkDelay: String = "1 hour"): DataFrame = {
    val scored = docs
      .select(col("doc_id"), col("ingest_ts"),
        PipelineQ.normText(col("text")).as("norm_text"))
      .filter(length(col("norm_text")) > 0)
      .withColumn("n_tokens", size(tokens(col("norm_text"))).cast(LongType))
      .withColumn("n_punct",
        (length(col("norm_text")) -
          length(regexp_replace(col("norm_text"), "[^\\w\\s]", "")))
          .cast(LongType))
    scored
      .filter(col("n_tokens") >= minTokens &&
        col("n_punct").cast(DoubleType) / length(col("norm_text")) <= maxPunctRatio)
      .withColumn("text_hash", md5(col("norm_text").cast("binary")))
      .withWatermark("ingest_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("text_hash")
      .select(col("doc_id"), col("ingest_ts"), col("norm_text"), col("n_tokens"))
  }
}
