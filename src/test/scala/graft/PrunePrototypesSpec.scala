package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_emb_prune_prototypes: within every cluster the
  * kept set is exactly the ceil(n/2) FARTHEST-from-centroid members,
  * singletons always survive, and the reported distance matches an
  * independent local recomputation.
  */
class PrunePrototypesSpec extends SparkSpecBase {

  test("corpus run: keep-half per cluster, hardest kept, singletons survive") {
    SparkEntry.prepares("q_emb_prune_prototypes")(spark, sfDir)
    val kept = SparkEntry.queries("q_emb_prune_prototypes")(spark, sfDir).collect()
    assert(kept.nonEmpty)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val keptByCluster = kept.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    // global size: sum over clusters of ceil(n_c/2) is between n/2 and n
    assert(kept.length >= (n / 2).toInt && kept.length < n.toInt)

    // independent reference: recompute assignment + distances locally
    // from the engine's own published centroid table (the oracle's view)
    val cents = spark.read
      .parquet(s"${graft.queries.OracleAux.root}/ivf_centroids/*")
      .filter(col("corpus_key") === emb.agg(sum("vec_id")).head.getLong(0))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def l2sq(v: Array[Float], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { val d = v(i) - c(i); s += d * d; i += 1 }
      s
    }
    val assigned = vecs.toSeq.map { case (id, v) =>
      val (cid, dist) = cents.toSeq.sortBy(_._1)
        .map { case (c, cv) => (c, l2sq(v, cv)) }
        .minBy { case (c, dd) => (dd, c) }
      (id, cid, dist)
    }
    val expectKept = assigned.groupBy(_._2).flatMap { case (_, members) =>
      val ranked = members.sortBy { case (id, _, dd) => (-dd, id) }
      ranked.take((members.size + 1) / 2)
    }.map(t => (t._1, t._2)).toSet
    assert(kept.map(r => (r.getLong(0), r.getInt(1))).toSet == expectKept)

    // reported distances equal the local recomputation bit-for-bit
    val distByVec = assigned.map(t => (t._1, t._2) -> t._3).toMap
    kept.foreach { r =>
      assert(r.getDouble(2) == distByVec((r.getLong(0), r.getInt(1))))
    }
    // every singleton cluster's lone member is kept
    assigned.groupBy(_._2).filter(_._2.size == 1).foreach { case (cid, m) =>
      assert(keptByCluster.getOrElse(cid, 0) == 1, s"singleton cluster $cid dropped")
    }
  }
}
