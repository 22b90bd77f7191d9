package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Persistent corpus content-hash index for incremental dedup — the
  * production shape of "dedup a new crawl dump against everything ever
  * kept". The index holds DISTINCT md5(text) hashes (16 bytes per
  * unique document, a small fraction of corpus bytes) and is BUCKETED
  * by hash at write time, so the batch-vs-corpus anti-join satisfies
  * the index side's distribution requirement from the files on disk:
  * only the (small) incoming batch shuffles; the (huge) index is read
  * in place, bucket by bucket. Appending accepted hashes keeps the
  * bucket spec, so the index never needs a rewrite as the corpus
  * grows — at 100 TB this is the difference between a dedup pass that
  * shuffles 16-byte keys of one dump and one that re-shuffles the
  * whole corpus history every crawl.
  *
  * Reference anchor: the reference dedups only within one ingest batch
  * (datasets/food_supply_gap/transformer.py:75 drop_duplicates); the
  * cross-run index is the scale extension a training pipeline needs.
  */
object HashIndex {

  /** Content hash of a document row (matches q_doc_exact_dedup /
    * q_doc_incremental_dedup semantics: md5 over raw text bytes).
    */
  def contentHash(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(text.cast(BinaryType))

  /** (Re)build the index as a bucketed table of distinct hashes. */
  def build(docs: DataFrame, table: String, buckets: Int = 8): Unit = {
    BandIndex.clearOrphanedLocation(docs.sparkSession, table)
    docs.select(contentHash(col("text")).as("h")).distinct()
      .write.mode("overwrite")
      .bucketBy(buckets, "h").sortBy("h")
      .saveAsTable(table)
  }

  /** Survivors of `batch` vs the index: one representative (min
    * doc_id) per content hash not yet in the corpus — identical
    * semantics to q_doc_incremental_dedup, but against the persistent
    * bucketed index. Returns (doc_id, h) so accepted rows can be fed
    * straight to [[append]].
    */
  def dedupAgainst(spark: SparkSession, table: String, batch: DataFrame): DataFrame =
    batch.select(col("doc_id"), contentHash(col("text")).as("h"))
      .join(spark.table(table), Seq("h"), "left_anti")
      .groupBy("h").agg(min("doc_id").as("doc_id"))
      .select(col("doc_id"), col("h"))

  /** Record accepted hashes. `buckets` must equal the value passed to
    * [[build]] (Spark rejects a mismatched bucket spec loudly); append
    * preserves the spec, so subsequent dedup joins stay shuffle-free
    * on the index side.
    */
  def append(spark: SparkSession, table: String, accepted: DataFrame,
             buckets: Int = 8): Unit =
    accepted.select(col("h"))
      .write.mode("append")
      .bucketBy(buckets, "h").sortBy("h")
      .saveAsTable(table)
}
