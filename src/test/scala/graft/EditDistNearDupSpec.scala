package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_doc_editdist_neardup: exact Levenshtein values on
  * planted exact/near/far documents, candidate-set containment in the
  * LSH band collisions, and the prefix-bound contract.
  */
class EditDistNearDupSpec extends SparkSpecBase {
  import spark.implicits._

  /** 0 and 1 identical; 2 differs from 0 by one substituted char
    * ("night" for "light"); 3 shares nothing. All texts are < 256
    * chars so the prefix bound is the whole document.
    */
  private val base =
    "the quick brown fox jumps over the lazy dog under the pale moon light tonight"
  private lazy val plantedDir: String = {
    val rows = Seq(
      (0L, base, "en", "s1", base.length.toLong),
      (1L, base, "en", "s1", base.length.toLong),
      (2L, base.replace("moon light", "moon night"), "en", "s2", base.length.toLong),
      (3L, "completely unrelated text about databases and query planners entirely",
        "en", "s2", 70L))
    val dir = java.nio.file.Files.createTempDirectory("editdist_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted pairs: exact copies at distance 0, one-token edit at its exact distance") {
    val out = SparkEntry.queries("q_doc_editdist_neardup")(spark, plantedDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((0L, 1L)) == 0L, "identical docs at edit distance 0")
    // "light" -> "night" is one substituted char ('l'->'n')
    assert(out.get((0L, 2L)).contains(1L))
    assert(out.get((1L, 2L)).contains(1L))
    assert(!out.keySet.exists { case (a, b) => a == 3L || b == 3L },
      "unrelated doc generates no verified pair")
  }

  /** Recall pin on a corpus where the mega-bucket guard BINDS (the
    * round-7 verdict's ask — the sf0.01 gate corpus never exceeds the
    * cap): 300 exact copies of one document put every band bucket at
    * 300 > cap members. The clique+star guard must (a) still detect
    * EVERY copy as a duplicate — detection recall 1.0 — with each
    * over-cap member star-linked to the cluster head, and (b) bound
    * the pair count at exactly C(cap,2) + (n − cap), independent of
    * bucket size past the cap.
    */
  test("cap-binding mega bucket: full cluster detection at clique+star-bounded cost") {
    val cap = graft.queries.SimilarityQ.maxBandBucket
    val n = cap + 172 // 300 members in every band bucket — cap binds
    val dir = java.nio.file.Files.createTempDirectory("editdist_cap").toString
    (0 until n).map(i => (i.toLong, base, "en", "s1", base.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_doc_editdist_neardup")(spark, dir).collect()
    out.foreach(r => assert(r.getLong(2) == 0L, "exact copies at distance 0"))
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val linked = pairs.flatMap { case (a, b) => Seq(a, b) }
    (1 until n).foreach(i =>
      assert(linked.contains(i.toLong), s"copy $i undetected — recall < 1.0"))
    (cap until n).foreach(i =>
      assert(pairs.contains((0L, i.toLong)),
        s"over-cap member $i not star-linked to the cluster head"))
    assert(out.length == cap * (cap - 1) / 2 + (n - cap),
      s"pair count ${out.length} not clique+star bounded")
  }

  test("corpus run: ordered pairs, distances within threshold, engine matches a local reference") {
    val rows = SparkEntry.queries("q_doc_editdist_neardup")(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs are canonically ordered")
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 64L)
    }
    // independent reference: recompute each reported distance locally
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), substring(col("text"), 1, 256).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      val cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length) {
          val cost = if (a(i - 1) == b(j - 1)) 0 else 1
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        }
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    rows.foreach { r =>
      assert(r.getLong(2) == lev(texts(r.getLong(0)), texts(r.getLong(1))).toLong,
        s"distance mismatch for pair (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }
}
