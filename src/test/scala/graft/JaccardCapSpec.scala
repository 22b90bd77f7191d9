package graft

import graft.queries.TextQ

/** Cap-sensitivity of the "exact" n-gram Jaccard ground truth
  * (TextQ.maxShingleDf caveat): the DF cap bounds candidate
  * generation, so the emitted pair set is exact only RELATIVE to the
  * cap. Three facts pinned here:
  *
  *   1. monotonicity — capped pairs are a subset of uncapped pairs
  *      (raising the cap can only add candidates, never change a
  *      surviving pair's Jaccard);
  *   2. no-op at test SF — the production cap (1000) equals the
  *      uncapped result on this corpus, so MinhashRecallSpec's recall
  *      denominator is the truly-exact pair set here;
  *   3. sensitivity is real — a degenerate cap (1: every shared
  *      shingle disqualifies itself) hides every pair, demonstrating
  *      that consumers of the exact form must state the cap.
  */
class JaccardCapSpec extends SparkSpecBase {

  private def pairSet(dfCap: Long): Map[(Long, Long), Double] =
    TextQ.ngramJaccardPairs(spark, sfDir, dfCap).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("capped pairs are a subset of uncapped pairs, with identical jaccard") {
    val capped = pairSet(TextQ.maxShingleDf)
    val uncapped = pairSet(Long.MaxValue)
    assert(capped.keySet.subsetOf(uncapped.keySet),
      s"cap added pairs: ${capped.keySet.diff(uncapped.keySet).take(5)}")
    capped.foreach { case (k, j) =>
      assert(uncapped(k) == j, s"jaccard drift for $k: ${uncapped(k)} vs $j")
    }
  }

  test("production cap is a no-op at test SF (recall baseline is truly exact)") {
    val capped = pairSet(TextQ.maxShingleDf)
    val uncapped = pairSet(Long.MaxValue)
    assert(uncapped.nonEmpty, "no near-dup pairs in fixture")
    assert(capped.keySet == uncapped.keySet,
      s"cap-invisible pairs at test SF: ${uncapped.keySet.diff(capped.keySet).take(5)}")
  }

  test("a degenerate cap hides pairs (cap sensitivity is real, not theoretical)") {
    val uncapped = pairSet(Long.MaxValue)
    val starved = pairSet(1L)
    assert(uncapped.nonEmpty)
    assert(starved.size < uncapped.size,
      s"cap=1 should hide shared-shingle candidates (${starved.size} vs ${uncapped.size})")
  }
}
