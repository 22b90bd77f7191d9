package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialize a curated corpus as training shards on disk: one
  * directory per shard_id (Hive-style `shard_id=N/`), each holding
  * exactly ONE parquet file with its documents in doc_id order — the
  * layout a training loader consumes (shard = the unit of work a data
  * loader claims; intra-shard order must be deterministic for
  * resumable epochs).
  *
  * Scale shape: `repartitionByRange(shard_id)` clusters every shard's
  * rows into a single partition (identical keys are never split across
  * range boundaries), so the `partitionBy` write emits one file per
  * shard without any driver-side loop or a global `coalesce(1)`. With
  * ~`shardTokenBudget` tokens per shard, file count scales with corpus
  * tokens / budget — independent of executor count — and the write
  * parallelism is min(#shards, cluster cores).
  */
object ShardSink {

  /** Write `curated` (doc_id, n_tokens, shard_id, payload columns…) as
    * partitioned shard directories under `dir`. Overwrites.
    */
  def writeShards(curated: DataFrame, dir: String): Unit =
    curated
      .repartitionByRange(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("doc_id"))
      .write
      .partitionBy("shard_id")
      .mode("overwrite")
      .parquet(dir)
}
