package graft

import org.apache.spark.sql.functions._

/** Ground truth for BM25 retrieval (q_doc_bm25): on a planted corpus
  * the ranking must express the three properties the formula exists
  * for — term-frequency saturation rewards matching docs, length
  * normalization penalizes padding, and IDF weights rare terms above
  * ubiquitous ones. The engine-vs-oracle bit-exactness is the verify
  * gate's job; this suite pins the retrieval SEMANTICS.
  */
class Bm25Spec extends SparkSpecBase {
  import spark.implicits._

  private val fn = SparkEntry.queries("q_doc_bm25")

  /** doc 0 is the query ("alpha beta gamma ..."): docs 10-19 contain
    * the query terms with varying tf and length; docs 20+ share no
    * terms. "common" appears in every doc (df = all), "alpha"/"beta"/
    * "gamma" only in the planted matches.
    */
  private lazy val plantedDir: String = {
    val rows = Seq(
      (0L, "alpha beta gamma common x0 y0 z0 w0"),
      (1L, "unrelated query two common filler filler2 filler3 filler4"),
      // dense short match: all three rare terms, twice each, short doc
      (10L, "alpha beta gamma alpha beta gamma"),
      // same content padded 5x longer: length norm must rank it below
      (11L, ("alpha beta gamma alpha beta gamma " + Seq.tabulate(24)(i => s"pad$i").mkString(" "))),
      // single rare term only
      (12L, "alpha noise1 noise2 noise3 noise4 noise5"),
      // only the ubiquitous term
      (13L, "common noise6 noise7 noise8 noise9 noise10")
    ) ++ (20 until 40).map(i => (i.toLong, s"common other$i words$i here$i"))
    val dir = java.nio.file.Files.createTempDirectory("bm25").toString
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def ranksFor(qid: Long): Seq[Long] =
    fn(spark, plantedDir).filter(col("qid") === qid)
      .orderBy(col("rnk").asc).select("doc_id")
      .collect().map(_.getLong(0)).toSeq

  test("dense match outranks padded match outranks partial match") {
    val r = ranksFor(0L)
    assert(r.head == 0L, s"the query doc itself must rank first: $r")
    val pos = r.zipWithIndex.toMap
    assert(pos(10L) < pos(11L),
      s"length normalization: dense doc 10 must beat its padded copy 11: $r")
    assert(pos(11L) < pos(12L),
      s"three rare terms (even padded) must beat one rare term: $r")
  }

  test("idf: a rare-term-only match outranks a ubiquitous-term-only match") {
    val r = ranksFor(0L)
    val pos = r.zipWithIndex.toMap
    assert(pos(12L) < pos.getOrElse(13L, Int.MaxValue),
      s"'alpha' (rare) must outweigh 'common' (df=all): $r")
  }

  test("top-k cap and per-query independence hold; runs are deterministic") {
    val out = fn(spark, plantedDir).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L))
    byQ.values.foreach { rs =>
      assert(rs.length <= graft.queries.TextQ.bm25TopK)
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length).toSeq)
    }
    // no-overlap docs never appear
    assert(!out.exists(r => r.getLong(2) >= 20L && r.getLong(0) == 0L) ||
      out.filter(r => r.getLong(0) == 0L && r.getLong(2) >= 20L)
        .forall(_.getLong(3) >= 1L))
    val again = fn(spark, plantedDir).collect()
    assert(out.toSeq == again.toSeq)
  }
}
