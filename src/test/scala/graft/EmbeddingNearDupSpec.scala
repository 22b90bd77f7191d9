package graft

import org.apache.spark.sql.functions._

import graft.queries.SimilarityQ

/** The LSH-candidate near-dup path vs the exact all-pairs form on a
  * fixture with *planted* near-duplicates (the testdata's random
  * vectors have no true pairs — max pairwise cosine ≈ 0.48 — so recall
  * must be measured on planted ones, per the q_embedding_neardup doc).
  */
class EmbeddingNearDupSpec extends SparkSpecBase {
  import spark.implicits._

  /** 300 random unit-ish vectors; every anchor id (multiple of 20) gets
    * a planted near-duplicate at id+1 (tiny perturbation → cosine
    * ≥ 0.99).
    */
  private lazy val planted = {
    val rng = new scala.util.Random(123)
    val dim = 64
    def randVec(): Array[Float] = Array.fill(dim)(rng.nextGaussian().toFloat)
    val rows = (0 until 300).map { id =>
      id.toLong -> randVec()
    }.toMap
    val perturbed = rows.map { case (id, v) =>
      if (id % 20 == 1) {
        val base = rows(id - 1)
        id -> base.zip(v).map { case (b, n) => b + 0.02f * n }
      } else id -> v
    }
    perturbed.toSeq.sortBy(_._1)
      .map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
  }

  test("exact all-pairs finds every planted pair") {
    val exact = SimilarityQ.embeddingNearDupExact(planted, 0.9)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 300 by 20).map(i => (i.toLong, i.toLong + 1)).toSet
    assert(expected.subsetOf(exact),
      s"missing planted pairs: ${expected.diff(exact)}")
  }

  test("LSH candidate path recalls planted near-dups vs the exact oracle") {
    val exact = SimilarityQ.embeddingNearDupExact(planted, 0.9)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityQ.embeddingNearDupLsh(planted, 0.9)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // rerank is exact → no false positives
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact).take(5)}")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    // cos≥0.99 pairs: per-band collision (1-θ/π)^4 ≈ 0.83, miss-all-16-
    // bands probability ≈ 4e-13 → expected recall ~1.0; 0.9 gives margin
    assert(recall >= 0.9, s"recall $recall < 0.9 (${lsh.size}/${exact.size})")
  }

  test("q_embedding_neardup on the driver testdata matches exact semantics") {
    // no true near-dups at this SF (max cosine ≈ 0.48 < 0.55): both the
    // LSH path and the exact form must return empty — and the LSH path
    // can never return MORE than exact (rerank is exact)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val lsh = SimilarityQ.embeddingNearDupLsh(emb, 0.55).count()
    val exact = SimilarityQ.embeddingNearDupExact(emb, 0.55).count()
    assert(exact == 0L)
    assert(lsh == 0L)
  }
}
