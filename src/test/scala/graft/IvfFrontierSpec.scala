package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_emb_ivf_frontier: monotonicity in nprobe, exact
  * agreement with the independently-computed q_emb_ann_recall ivf row
  * at full probe depth (the coverage ≡ recall@k theorem the query's
  * scaladoc argues, validated empirically), and scan-fraction bounds.
  */
class IvfFrontierSpec extends SparkSpecBase {

  private lazy val rows =
    SparkEntry.queries("q_emb_ivf_frontier")(spark, sfDir).collect()

  test("frontier is monotone: recall and scan fraction never decrease with nprobe") {
    assert(rows.length == 6)
    val recalls = rows.map(_.getDouble(3))
    val scans = rows.map(_.getDouble(4))
    assert(recalls.toSeq == recalls.sorted.toSeq, recalls.mkString(", "))
    assert(scans.toSeq == scans.sorted.toSeq, scans.mkString(", "))
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0,
        "probing at least one list scans a positive fraction")
    }
  }

  test("coverage at full depth equals the reranked IVF recall@k (the frontier theorem)") {
    // q_emb_ann_recall's ivf arm RERANKS candidates and intersects the
    // reported top-k with brute force; the frontier only checks
    // CANDIDATE COVERAGE of the true top-k. With an exact rerank the
    // two are provably equal — this pins the proof with data computed
    // through two different plans.
    val frontierAtMax = rows.last
    val recallRow = SparkEntry.queries("q_emb_ann_recall")(spark, sfDir)
      .filter(col("method") === "ivf" && col("k") === 10)
      .collect()
    assert(recallRow.length == 1)
    assert(frontierAtMax.getInt(0) == 6)
    assert(frontierAtMax.getDouble(3) == recallRow.head.getDouble(4),
      s"coverage ${frontierAtMax.getDouble(3)} != reranked recall ${recallRow.head.getDouble(4)}")
  }

  test("exact arithmetic: n_matched bounded by queries x k, scan by probed lists") {
    rows.foreach { r =>
      val nq = r.getLong(1)
      assert(r.getLong(2) <= nq * 10, "more matches than true top-k edges")
      assert(r.getDouble(3) == r.getLong(2).toDouble / (10.0 * nq))
    }
  }
}
