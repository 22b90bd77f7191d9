package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_doc_containment: a small document quoted inside
  * a much larger one scores containment 1.0 while its Jaccard stays
  * far below the 0.5 near-dup bar — the quote/subset class the
  * symmetric metric ships to training. Plus threshold-edge and corpus
  * consistency checks.
  */
class ContainmentSpec extends SparkSpecBase {
  import spark.implicits._

  /** doc 0: 5 "quote" tokens (3 shingles). doc 1: 29 tokens with the
    * quote embedded mid-document (27 distinct shingles, all 3 quote
    * shingles among them). doc 2: unrelated. doc 3/4: share 2 of
    * doc 3's 3 shingles -> containment 2/3 < 0.8, excluded.
    */
  private lazy val plantedDir: String = {
    val quote = (1 to 5).map(i => s"s$i")
    val large = (1 to 12).map(i => s"w$i") ++ quote ++ (13 to 24).map(i => s"w$i")
    val rows = Seq(
      (0L, quote.mkString(" "), "en", "srcA", 20L),
      (1L, large.mkString(" "), "en", "srcB", 120L),
      (2L, (1 to 10).map(i => s"z$i").mkString(" "), "en", "srcC", 40L),
      (3L, "p1 p2 p3 p4 p5", "en", "srcD", 20L),
      (4L, "p1 p2 p3 p4 q9", "en", "srcD", 20L))
    val dir = java.nio.file.Files.createTempDirectory("cont_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("embedded quote: containment exactly 1.0, jaccard far below the dedup bar") {
    val out = SparkEntry.queries("q_doc_containment")(spark, plantedDir).collect()
    assert(out.length == 1, s"only the (0,1) quote pair passes 0.8: ${out.mkString(";")}")
    val r = out.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L && r.getLong(4) == 27L)
    assert(r.getDouble(5) == 1.0)
    assert(r.getDouble(6) == 3.0 / 27.0, "jaccard misses this pair entirely")
    assert(r.getDouble(6) < 0.5)
  }

  test("corpus run: containment >= jaccard on every pair, both in (0,1]") {
    val rows = SparkEntry.queries("q_doc_containment")(spark, sfDir).collect()
    rows.foreach { r =>
      val (c, j) = (r.getDouble(5), r.getDouble(6))
      assert(c >= 0.8 && c <= 1.0)
      assert(c >= j, s"containment < jaccard on (${r.getLong(0)},${r.getLong(1)})")
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
    }
  }

  test("containment pairs are a superset of high-jaccard pairs with equal sets") {
    // every jaccard >= 0.8 pair has containment >= jaccard >= 0.8
    val cont = SparkEntry.queries("q_doc_containment")(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val jacHigh = graft.queries.TextQ.jaccardPairsShared(spark, sfDir)
      .filter(col("jaccard") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jacHigh.subsetOf(cont))
  }
}
