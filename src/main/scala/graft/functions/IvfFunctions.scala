package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the coarse-
  * quantizer counterpart to the hyperplane-LSH path (SURVEY §7.6 names
  * both as the scale options):
  *
  *   1. train a k-means coarse quantizer over the embedding corpus
  *      (Spark ML KMeans — distributed, seeded);
  *   2. assign every vector to its nearest centroid — the "inverted
  *      list" id, a plain integer key;
  *   3. queries probe their `nProbe` nearest centroids, equi-join on
  *      the list id for candidates, and exact-rerank with the codegen
  *      fast_cosine.
  *
  * Scale shape: the index is (vector, int) — at 100 TB the lists can
  * be bucketed/partitioned by `cid` so probes touch only matching
  * partitions (partition pruning); candidate volume is
  * |corpus| × nProbe / k on balanced lists. The centroid table ships
  * as a TorrentBroadcast (once per executor, not once per task
  * closure), so the index stays honest at large k — k=65k × 64 dims is
  * ~33 MB, fine broadcast, fatal closure. Assignment stays a per-row
  * UDF over the broadcast rather than a join against a centroid table:
  * a broadcast-join argmin would materialize k candidate rows per
  * vector before aggregating them away — a k× row blowup the UDF's
  * internal argmin never pays.
  */
object IvfFunctions {

  /** Training-sample bound: ~256 vectors per centroid (the FAISS
    * guideline band is 39–256/centroid). With adaptiveK ≈ N/125 this
    * only binds once the k cap does (N ≳ 5×10^5 with cap 4096) — but
    * at 100 TB it is THE difference between a bounded training job
    * (≤ ~1M vectors regardless of corpus size) and k-means over the
    * whole corpus.
    */
  def trainSampleSize(k: Int): Long = 256L * k

  /** Train the coarse quantizer; returns k centroid vectors. Training
    * runs on a deterministic hash-cut sample of ≤ [[trainSampleSize]]
    * vectors (corpus-order- and partitioning-independent, stable under
    * appends like every other sampling surface here); corpora at the
    * fixture SFs are below the bound and train on everything, so gate
    * results are unchanged.
    */
  def trainCentroids(emb: DataFrame, embeddingCol: String, k: Int,
                     seed: Long = 42, maxIter: Int = 10): Array[Array[Double]] = {
    val cap = trainSampleSize(k)
    val n = emb.count()
    val train =
      if (n <= cap) emb
      else emb.filter(
        pmod(xxhash64(col("vec_id"), lit(seed)), lit(n / cap + 1)) === 0)
    val toVec = udf((a: Seq[Float]) =>
      Vectors.dense(a.map(_.toDouble).toArray))
    val feats = train.select(toVec(col(embeddingCol)).as("features"))
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter).setFeaturesCol("features")
      .fit(feats)
    model.clusterCenters.map(_.toArray)
  }

  private def l2sq(v: Seq[Float], c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(v.length, c.length)
    while (i < n) { val d = v(i) - c(i); s += d * d; i += 1 }
    s
  }

  /** Ship the centroid table to executors once (TorrentBroadcast). */
  def broadcastCentroids(emb: DataFrame,
                         centroids: Array[Array[Double]]): Broadcast[Array[Array[Double]]] =
    emb.sparkSession.sparkContext.broadcast(centroids)

  /** Nearest-centroid (inverted list) id. */
  def assignUdf(bc: Broadcast[Array[Array[Double]]]): UserDefinedFunction =
    udf { v: Seq[Float] =>
      val centroids = bc.value
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val d = l2sq(v, centroids(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

  /** Nearest-centroid id plus the squared L2 distance to it — the
    * assignment SemDeDup ranks within (distance to centroid is its
    * keep-priority signal), computed in the same single pass as the
    * list id so clustering consumers don't run the argmin twice.
    */
  def assignWithDistUdf(bc: Broadcast[Array[Array[Double]]]): UserDefinedFunction =
    udf { v: Seq[Float] =>
      val centroids = bc.value
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val d = l2sq(v, centroids(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      (best, bestD)
    }

  /** The `nProbe` nearest centroid ids for a query vector. */
  def probeUdf(bc: Broadcast[Array[Array[Double]]], nProbe: Int): UserDefinedFunction =
    udf { v: Seq[Float] =>
      val centroids = bc.value
      centroids.indices
        .map(c => (l2sq(v, centroids(c)), c))
        .sorted.take(nProbe).map(_._2)
    }

  /** End-to-end IVF top-k: index `emb`, answer `queries` (vec_id,
    * embedding) with exact-cosine rerank over the probed lists.
    */
  def annTopK(emb: DataFrame, queries: DataFrame, k: Int, nProbe: Int,
              topK: Int, seed: Long = 42): DataFrame =
    annTopKWith(emb, queries, trainCentroids(emb, "embedding", k, seed),
      nProbe, topK)

  /** [[annTopK]] with a pre-trained centroid table — lets the catalog
    * entry materialize the exact centroids it retrieves with for the
    * DuckDB oracle replay (assignment + probe + rerank re-run in SQL).
    */
  def annTopKWith(emb: DataFrame, queries: DataFrame,
                  centroidRows: Array[Array[Double]], nProbe: Int,
                  topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expressions.CosineSimilarity.ensureRegistered(emb.sparkSession)
    val centroids = broadcastCentroids(emb, centroidRows)
    val lists = emb.withColumn("cid", assignUdf(centroids)(col("embedding")))
    val probed = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      explode(probeUdf(centroids, nProbe)(col("embedding"))).as("cid"))
    lists.join(broadcast(probed), Seq("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .dropDuplicates("query_id", "vec_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        VectorFunctions.fastCosine(col("q_emb"), col("embedding")).as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }
}
