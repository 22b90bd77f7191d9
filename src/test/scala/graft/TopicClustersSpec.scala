package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_emb_topic_clusters and q_emb_hard_negatives
  * beyond the band-key oracle replay: planted tight clusters must come
  * back as components, and hard negatives must honor the label
  * constraint with exact scores.
  */
class TopicClustersSpec extends SparkSpecBase {
  import spark.implicits._

  /** Three tight clusters of 6 near-identical unit-ish vectors around
    * orthogonal axes (cosine within cluster ≈ 1, across ≈ 0), labels
    * striped so every cluster holds BOTH labels.
    */
  private lazy val plantedDir: String = {
    val dim = 64
    val rnd = new scala.util.Random(7)
    def vec(axis: Int, jitter: Double): Seq[Float] =
      (0 until dim).map(i =>
        ((if (i == axis) 1.0 else 0.0) + jitter * rnd.nextGaussian()).toFloat)
    val rows = for {
      c <- 0 until 3
      j <- 0 until 6
    } yield (c * 6L + j, vec(c * 20, 0.01), j % 2)
    val dir = java.nio.file.Files.createTempDirectory("topics").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("planted clusters come back as exactly their components") {
    val out = SparkEntry.queries("q_emb_topic_clusters")(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every planted member is present and labeled by its cluster min
    assert(out.length == 18, s"expected 18 clustered vectors, got ${out.length}")
    out.foreach { case (v, cid, sz) =>
      assert(cid == (v / 6) * 6, s"vec $v in wrong component $cid")
      assert(sz == 6L, s"component size $sz != 6")
    }
  }

  test("hard negatives: every neighbor has a different label, scores exact") {
    val out = SparkEntry.queries("q_emb_hard_negatives")(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val labels = (0 until 18).map(v => v.toLong -> v % 2).toMap
    out.foreach { case (v, n, _, _) =>
      assert(labels(v) != labels(n), s"same-label pair $v -> $n")
    }
    // within a tight cluster the cross-label neighbors ARE cluster
    // peers: top negatives should come from the anchor's own cluster
    out.filter(_._3 == 1).foreach { case (v, n, _, sc) =>
      assert(n / 6 == v / 6, s"top negative of $v from wrong cluster: $n")
      assert(sc > 0.9, s"tight-cluster negative score $sc unexpectedly low")
    }
    // ranks dense from 1 per anchor
    out.groupBy(_._1).foreach { case (v, es) =>
      assert(es.map(_._3).sorted.toSeq == (1 to es.length),
        s"$v ranks not dense")
    }
  }

  test("corpus topic clusters: membership implies a strong edge, sizes consistent") {
    val comp = SparkEntry.queries("q_emb_topic_clusters")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bySize = comp.groupBy(_._2).map { case (cid, ms) => cid -> ms.length }
    comp.foreach { case (_, cid, sz) =>
      assert(bySize(cid).toLong == sz, s"size column inconsistent for $cid")
    }
    // cluster_id is the component min
    comp.groupBy(_._2).foreach { case (cid, ms) =>
      assert(ms.map(_._1).min == cid, s"cluster id $cid is not member min")
    }
  }
}
