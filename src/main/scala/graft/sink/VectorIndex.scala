package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.IvfFunctions

/** Persistent IVF vector index — the embedding sibling of
  * [[HashIndex]]/[[BandIndex]] (round-12 verdict #5): centroids plus
  * inverted lists MATERIALIZED as warehouse tables, so an ANN
  * deployment searches (and grows) the index across sessions without
  * ever retraining or re-assigning the corpus. Layout:
  *
  *   - `<table>`           — the inverted lists: (cid, vec_id,
  *     embedding), BUCKETED by cid at write time. A probe reads only
  *     its candidate lists: the `cid IN (probed)` filter prunes
  *     buckets at the scan (SelectedBucketsCount in the plan), and
  *     the batch-vs-index candidate join broadcasts the (tiny) probe
  *     table — the index side is read in place, never shuffled. At
  *     100 TB this is the difference between touching
  *     nProbe/k of the corpus per query batch and re-shuffling the
  *     whole vector store every search.
  *   - `<table>_centroids` — (cid, c: array<double>): k rows, read
  *     whole and broadcast. k ≤ 65536 by the adaptive-k cap, ≈ 33 MB
  *     at 64 dims — a TorrentBroadcast, fatal as anything else.
  *
  * Append assigns NEW vectors against the EXISTING centroids (the
  * incremental contract — centroids are fixed once trained, the
  * standard FAISS IVF growth mode) and appends preserving the bucket
  * spec, so the index grows batch over batch with no rewrite and
  * probe reads stay bucket-aligned forever.
  *
  * Candidates are APPROXIMATE (nProbe lists per query); [[search]]
  * exact-reranks them with the codegen cosine before anything is
  * returned — the same candidates→verify contract as every ANN path
  * in this engine. VectorIndexSpec proves result-identity with the
  * in-session IVF path, the pruned zero-Exchange index read, and
  * append/rebuild equivalence; q_ann_ivf_persistent oracle-gates the
  * search output end-to-end.
  */
object VectorIndex {

  /** (Re)build the index from an embeddings frame and a trained
    * centroid table. Assignment is [[IvfFunctions.assignUdf]] — the
    * same argmin the in-session IVF path uses, so a search against
    * the materialized index returns exactly what the in-session path
    * returns (VectorIndexSpec pins this identity).
    */
  def build(emb: DataFrame, table: String, centroids: Array[Array[Double]],
            buckets: Int = 8): Unit = {
    val s = emb.sparkSession
    BandIndex.clearOrphanedLocation(s, table)
    BandIndex.clearOrphanedLocation(s, s"${table}_centroids")
    val bc = IvfFunctions.broadcastCentroids(emb, centroids)
    emb.select(IvfFunctions.assignUdf(bc)(col("embedding")).as("cid"),
        col("vec_id"), col("embedding"))
      .write.mode("overwrite")
      .bucketBy(buckets, "cid").sortBy("cid")
      .saveAsTable(table)
    val rows = centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
    import s.implicits._
    rows.toSeq.toDF("cid", "c")
      .coalesce(1).write.mode("overwrite").saveAsTable(s"${table}_centroids")
  }

  /** The trained coarse quantizer, cid-ordered — k rows, one read. */
  def loadCentroids(spark: SparkSession, table: String): Array[Array[Double]] =
    spark.table(s"${table}_centroids")
      .orderBy(col("cid").asc)
      .collect()
      .map(_.getSeq[Double](1).toArray)

  /** ANN top-k for `queries` (vec_id, embedding) against the stored
    * index — no training, no corpus assignment: centroids load from
    * the k-row table, each query probes its nProbe nearest lists, and
    * the scan reads ONLY the probed buckets (the collected probe-cid
    * set is bounded by |queries| × nProbe — the fixed-query-set
    * driver reduction already used by the PQ path). Self-matches are
    * excluded and candidates exact-rerank, identical to the
    * in-session IVF contract.
    */
  def search(spark: SparkSession, table: String, queries: DataFrame,
             nProbe: Int, topK: Int): DataFrame = {
    val centroids = loadCentroids(spark, table)
    val bc = IvfFunctions.broadcastCentroids(queries, centroids)
    val probed = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      explode(IvfFunctions.probeUdf(bc, nProbe)(col("embedding"))).as("cid"))
    val probedCids = probed.select("cid").distinct()
      .collect().map(_.getInt(0)).sorted
    val lists = spark.table(table).filter(col("cid").isin(probedCids.map(Int.box): _*))
    IvfFunctions.rerankProbed(lists, probed, topK)
  }

  /** Record a new batch: assign against the EXISTING centroids and
    * append. `buckets` must match [[build]] (Spark rejects a
    * mismatched spec loudly); append preserves the spec, so probe
    * reads stay bucket-pruned as the index grows.
    */
  def append(spark: SparkSession, table: String, emb: DataFrame,
             buckets: Int = 8): Unit = {
    val centroids = loadCentroids(spark, table)
    val bc = IvfFunctions.broadcastCentroids(emb, centroids)
    emb.select(IvfFunctions.assignUdf(bc)(col("embedding")).as("cid"),
        col("vec_id"), col("embedding"))
      .write.mode("append")
      .bucketBy(buckets, "cid").sortBy("cid")
      .saveAsTable(table)
  }
}
