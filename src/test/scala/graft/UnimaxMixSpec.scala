package graft

/** Ground truth for q_doc_unimax_mix: the waterfilling allocation on a
  * planted skewed-language corpus — the rare language saturates at the
  * epoch cap, its unused share flows to the big language — plus copy
  * realization and budget conservation on the real corpus.
  */
class UnimaxMixSpec extends SparkSpecBase {
  import spark.implicits._

  /** Two languages, radically skewed: `rare` has 2 docs × 10 chars
    * (mass 20), `big` has 8 docs × 120 chars (mass 960). Budget =
    * 980/2 = 490, fair share per lang 245. rare caps at 2 epochs
    * (alloc 40 < 245); big then takes min(2·960, 490−40) = 450 →
    * epochs 450/960 = 0.46875. So every rare doc appears exactly
    * twice and big docs are subsampled with zero full copies.
    */
  private lazy val plantedDir: String = {
    val rare = (0 until 2).map(i => (i.toLong, s"r $i", "rare", "s", 10L))
    val big = (10 until 18).map(i => (i.toLong, s"b $i", "big", "s", 120L))
    val dir = java.nio.file.Files.createTempDirectory("unimax_fix").toString
    (rare ++ big).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted skew: rare saturates at exactly cap copies, big subsamples below 1 epoch") {
    val rows = SparkEntry.queries("q_doc_unimax_mix")(spark, plantedDir).collect()
    val byDoc = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    // rare docs: epochs exactly 2.0 -> two copies each, no fractional cut
    assert(byDoc.get(0L).contains(2))
    assert(byDoc.get(1L).contains(2))
    // big docs: epochs = 0.46875 -> 0 or 1 copies, never 2
    (10L until 18L).foreach { id =>
      assert(byDoc.getOrElse(id, 0) <= 1, s"big doc $id over-replicated")
    }
    // copies are consecutively numbered from 0
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.map(_.getLong(2)).sorted.sameElements(0L until g.length))
    }
  }

  test("corpus run: expected char mass per lang tracks the waterfilling allocation") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val stats = docs.groupBy("lang").agg(org.apache.spark.sql.functions.sum("n_chars").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble)
      .sortBy { case (lang, mass) => (mass, lang) }
    var remaining = stats.map(_._2).sum * 0.5
    val nl = stats.length
    val epochs = stats.zipWithIndex.map { case ((lang, mass), i) =>
      val alloc = math.min(2.0 * mass, remaining / (nl - i).toDouble)
      remaining -= alloc
      lang -> alloc
    }.toMap
    val out = SparkEntry.queries("q_doc_unimax_mix")(spark, sfDir)
    val chars = out.join(docs.select("doc_id", "n_chars"), "doc_id")
      .groupBy("lang").agg(org.apache.spark.sql.functions.sum("n_chars").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    epochs.foreach { case (lang, alloc) =>
      val got = chars.getOrElse(lang, 0.0)
      // md5-cut realization: expected mass == alloc; tolerate sampling noise
      assert(math.abs(got - alloc) <= 0.35 * alloc + 200.0,
        s"$lang realized $got vs allocation $alloc")
    }
  }
}
