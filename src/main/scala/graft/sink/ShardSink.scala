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
    * partitioned shard directories under `dir`. When a `split` column
    * is present (the curate pipeline's train/val/test assignment, with
    * per-split shard sequences), the layout nests it first —
    * `split=train/shard_id=N/` — since (split, shard_id) is the shard
    * key there, not shard_id alone. Overwrites.
    */
  def writeShards(curated: DataFrame, dir: String): Unit = {
    val partCols =
      if (curated.columns.contains("split")) Seq("split", "shard_id")
      else Seq("shard_id")
    curated
      .repartitionByRange(partCols.map(col): _*)
      .sortWithinPartitions((partCols :+ "doc_id").map(col): _*)
      .write
      .partitionBy(partCols: _*)
      .mode("overwrite")
      .parquet(dir)
  }

  /** The manifest a data loader reads INSTEAD of listing and footer-
    * probing every shard file: one row per shard with its document
    * count, token mass, doc_id bounds, and a content fingerprint
    * (xor of per-row hashes over EVERY column, payload text included —
    * order-independent, so it is stable under any partitioning, and
    * sensitive to any rewrite of the rows a shard holds). Pass the
    * READ-BACK of the written shard tree (as the curate CLI does) so
    * the fingerprint certifies the files on disk, not the plan that
    * produced them. Written as a single tiny parquet table next to
    * the shards.
    */
  def writeManifest(shards: DataFrame, dir: String): Unit =
    manifestOf(shards)
      .coalesce(1) // one row per shard: the manifest IS driver-scale
      .write.mode("overwrite").parquet(s"$dir/_manifest")

  /** Manifest rows (shard_id, n_docs, n_tokens, min/max doc_id,
    * content_hash), exposed for specs and for verification reads.
    */
  def manifestOf(shards: DataFrame): DataFrame = {
    val allCols = shards.columns.map(col).toIndexedSeq
    val keyCols =
      if (shards.columns.contains("split")) Seq("split", "shard_id")
      else Seq("shard_id")
    shards
      .withColumn("__h", xxhash64(allCols: _*))
      .groupBy(keyCols.map(col): _*).agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        min("doc_id").as("min_doc_id"),
        max("doc_id").as("max_doc_id"),
        expr("bit_xor(__h)").as("content_hash"))
  }
}
