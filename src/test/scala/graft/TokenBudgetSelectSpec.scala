package graft

/** Ground truth for q_doc_token_budget_select: planted tiers select in
  * quality order with the budget line drawn mid-document, and the
  * corpus run conserves the budget exactly (kept-token start positions
  * all inside, first excluded start outside).
  */
class TokenBudgetSelectSpec extends SparkSpecBase {
  import spark.implicits._

  /** Four 10-token docs, stopword densities 100%, 50%, 20%, 0% →
    * tiers 1000/500/200/0. Total 40 tokens, budget 20: the tier-1000
    * doc (start 0) and tier-500 doc (start 10) are kept; tier-200
    * starts AT 20 (= budget, excluded); tier-0 never.
    */
  private lazy val plantedDir: String = {
    val all = Seq.fill(10)("the").mkString(" ")
    val half = (Seq.fill(5)("the") ++ Seq.fill(5)("xx")).mkString(" ")
    val fifth = (Seq.fill(2)("the") ++ Seq.fill(8)("xx")).mkString(" ")
    val none = Seq.fill(10)("xx").mkString(" ")
    val rows = Seq(
      (0L, none, "en", "s", none.length.toLong),
      (1L, fifth, "en", "s", fifth.length.toLong),
      (2L, half, "en", "s", half.length.toLong),
      (3L, all, "en", "s", all.length.toLong))
    val dir = java.nio.file.Files.createTempDirectory("tokbudget_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted tiers: selection follows quality order, budget line excludes the boundary doc") {
    val kept = SparkEntry.queries("q_doc_token_budget_select")(spark, plantedDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(kept.keySet == Set(2L, 3L))
    assert(kept(3L) == ((1000L, 10L)))
    assert(kept(2L) == ((500L, 10L)))
  }

  test("corpus run: kept set is a prefix of the (tier desc, doc_id) order at exactly the budget") {
    val rows = SparkEntry.queries("q_doc_token_budget_select")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // reference: recompute the full ranking locally
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val stops = toks.count(graft.functions.TextFunctions.stopwords.contains)
        (r.getLong(0), toks.length.toLong,
          math.floor(1000.0 * stops / toks.length).toLong)
      }
      .filter(_._2 > 0)
    val budget = docs.map(_._2).sum / 2
    val ordered = docs.sortBy { case (id, _, tier) => (-tier, id) }
    var acc = 0L
    val expect = ordered.takeWhile { case (_, n, _) =>
      val keep = acc < budget; acc += n; keep
    }.map(_._1).toSet
    assert(rows.map(_._1).toSet == expect)
    val keptTokens = rows.map(_._3).sum
    assert(keptTokens >= budget, "kept set covers the budget (boundary doc included)")
  }
}
