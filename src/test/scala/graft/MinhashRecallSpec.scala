package graft

/** Ground truth for the no-oracle q_doc_minhash_lsh: its pairs are
  * checked against q_doc_ngram_jaccard — the oracle-verified *exact*
  * Jaccard≥0.5 pairs over the identical shingle definition (the
  * contract stated in TextQ's doc).
  *
  * CAP CAVEAT: "exact" is relative to TextQ.maxShingleDf — a pair
  * whose shared shingles are ALL hotter than the cap appears in
  * neither the baseline nor (by the same candidate construction) the
  * LSH result, so the recall denominator here is the capped pair set.
  * JaccardCapSpec verifies the cap is a no-op at test SF, so these
  * recall numbers are against the truly-exact pair set on this corpus.
  */
class MinhashRecallSpec extends SparkSpecBase {

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash LSH pairs are a subset of exact Jaccard>=0.5 pairs (precision 1.0)") {
    val exact = pairs("q_doc_ngram_jaccard")
    val lsh = pairs("q_doc_minhash_lsh")
    assert(exact.nonEmpty, "exact near-dup baseline found no pairs")
    // the final filter reranks with true Jaccard over the same shingle
    // sets, so every emitted pair must also be an exact pair
    assert(lsh.subsetOf(exact),
      s"false positives: ${lsh.diff(exact).take(5)}")
  }

  test("minhash LSH recall vs exact pairs") {
    val exact = pairs("q_doc_ngram_jaccard")
    val lsh = pairs("q_doc_minhash_lsh")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    // 4 bands × 4 rows over k=16: a J=0.9 pair misses all bands w.p.
    // (1-0.9^4)^4 ≈ 1.3e-3; the planted near-dups in the testdata are
    // high-J so measured recall is ~1.0. 0.8 leaves margin.
    assert(recall >= 0.8, s"recall $recall < 0.8 (${lsh.size}/${exact.size})")
  }

  test("reported jaccard values are exact (match the oracle-checked query)") {
    val exact = SparkEntry.queries("q_doc_ngram_jaccard")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = SparkEntry.queries("q_doc_minhash_lsh")(spark, sfDir).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(exact.contains(k), s"pair $k not in exact result")
      assert(exact(k) == r.getDouble(2),
        s"jaccard mismatch for $k: ${exact(k)} vs ${r.getDouble(2)}")
    }
  }
}
