package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{IvfFunctions, PqFunctions}

/** Ground truth for the IVF-PQ composition: residual arithmetic,
  * one-list-per-vector coverage, and recall of the probed-list ADC path
  * against the exact brute force.
  */
class IvfPqSpec extends SparkSpecBase {
  import spark.implicits._

  test("residual UDF computes x - c(cid) with float rounding per element") {
    val cents = Array(Array(0.5, -1.0, 2.0), Array(0.0, 0.0, 0.0))
    val df = Seq((1L, Seq(1.0f, 1.0f, 1.0f), 0), (2L, Seq(0.25f, -0.5f, 3.5f), 1))
      .toDF("vec_id", "v", "cid")
      .select(col("vec_id"), col("v").cast("array<float>").as("v"), col("cid"))
    val bc = IvfFunctions.broadcastCentroids(df, cents)
    val out = df.select(col("vec_id"),
        IvfFunctions.residualUdf(bc)(col("v"), col("cid")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out(1L) == Seq(0.5f, 2.0f, -1.0f))
    assert(out(2L) == Seq(0.25f, -0.5f, 3.5f)) // zero centroid: identity
  }

  test("q_ann_ivfpq recall@10 vs q_ann_bruteforce (probed residual-ADC + exact rerank)") {
    def neighborSets(rows: Array[Row]): Map[Long, Set[Long]] =
      rows.groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet
      }
    val exact = neighborSets(
      SparkEntry.queries("q_ann_bruteforce")(spark, sfDir)
        .select("query_id", "neighbor_id").collect())
    val ivfpq = neighborSets(
      SparkEntry.queries("q_ann_ivfpq")(spark, sfDir)
        .select("query_id", "neighbor_id").collect())
    assert(exact.nonEmpty)
    val recalls = exact.map { case (q, truth) =>
      ivfpq.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // probing 6 lists bounds recall by list coverage; with the 64-cand
    // ADC cut the measured value sits well above this floor
    assert(mean >= 0.4, s"mean recall@10 $mean (per-query: $recalls)")
  }

  test("cluster balance downsamples over-represented clusters by the exact md5 cut") {
    import graft.queries.SimilarityQ
    // 200 vecs in cluster 0, 20 in cluster 1: fair share 110 ->
    // rate(0)=0.55, rate(1)=1.0
    val assigned = ((0L until 200L).map((_, 0)) ++ (200L until 220L).map((_, 1)))
      .toDF("vec_id", "cid")
    val out = SimilarityQ.clusterBalance(assigned)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val kept0 = out.filter(_._2 == 0).map(_._1).toSet
    val kept1 = out.filter(_._2 == 1).map(_._1).toSet
    // under-represented cluster is untouched
    assert(kept1 == (200L until 220L).toSet)
    // the exact survivor set is computable: md5 prefix < floor(0.55*2^32)
    val threshold = f"${math.floor(0.55 * 4294967296.0).toLong}%08x"
    val expected0 = (0L until 200L).filter { id =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8) < threshold
    }.toSet
    assert(kept0 == expected0, s"kept ${kept0.size}, expected ${expected0.size}")
    // and the cut actually thinned the fat cluster toward fair share
    assert(kept0.size < 150 && kept0.size > 70)
  }

  test("every corpus vector lands in exactly one inverted list with m residual codes") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val centroids = IvfFunctions.trainCentroids(emb, "embedding", 8, seed = 42)
    val bc = IvfFunctions.broadcastCentroids(emb, centroids)
    val resid = emb
      .withColumn("cid", IvfFunctions.assignUdf(bc)(col("embedding")))
      .withColumn("r", IvfFunctions.residualUdf(bc)(col("embedding"), col("cid")))
    val cb = PqFunctions.trainCodebooks(resid, "r")
    val bcCb = PqFunctions.broadcastCodebooks(emb, cb)
    val codes = resid.select(col("vec_id"), col("cid"),
      PqFunctions.encodeUdf(bcCb)(col("r")).as("cs"))
    val n = emb.count()
    assert(codes.count() == n)
    assert(codes.select("vec_id").distinct().count() == n)
    val bad = codes.filter(size(col("cs")) =!= PqFunctions.numSubspaces ||
      col("cid") < 0 || col("cid") >= centroids.length).count()
    assert(bad == 0L)
  }
}
