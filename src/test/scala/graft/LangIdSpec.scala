package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.langId

/** Ground truth for the no-oracle q_doc_langid.
  *
  * Note on the driver corpus: documents.lang is NOT derivable from
  * documents.text — every document draws from the same English-ish
  * synthetic vocabulary ("spark group query row data…") regardless of
  * its lang label, so no text-based classifier can recover the label.
  * The first test PROVES that (cross-language vocabulary is ~identical);
  * accuracy is therefore graded on real multilingual fixtures, and the
  * corpus run is checked for determinism + domain.
  */
class LangIdSpec extends SparkSpecBase {
  import spark.implicits._

  test("corpus text carries no language signal (vocabularies coincide across labels)") {
    val vocab = graft.sources.Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(lower(col("text")), "\\s+")).as("tok"))
      .distinct()
      .groupBy("lang").agg(collect_set("tok").as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(vocab.size >= 4)
    val en = vocab("en")
    for ((lang, v) <- vocab if lang != "en") {
      val jaccard = v.intersect(en).size.toDouble / v.union(en).size
      assert(jaccard > 0.8,
        s"$lang vocabulary unexpectedly distinct from en (J=$jaccard) — " +
          "if the corpus gains real multilingual text, grade accuracy vs lang here")
    }
  }

  test("langId recovers the language of real multilingual fixture text") {
    val fixtures = Seq(
      ("en", "the committee and the council agreed that it is in the interest of the public"),
      ("en", "this is the house that jack built and the cat that chased the rat"),
      ("es", "el gobierno de la ciudad aprobó los presupuestos para las escuelas con una mayoría"),
      ("es", "los vecinos de la plaza organizaron una fiesta por el aniversario del barrio"),
      ("fr", "le conseil municipal est dans une situation difficile pour les écoles qui restent"),
      ("fr", "les enfants jouent dans le parc pour une heure après les cours du matin"),
      ("de", "der rat der stadt ist mit der planung nicht zufrieden und das projekt wird geprüft"),
      ("de", "die kinder spielen auf der straße und das wetter ist nicht gut heute"),
      ("zh", "纽约市议会批准了新的预算计划 市长表示支持 社区居民参加了听证会"),
      ("zh", "今天天气很好 我们去公园散步 孩子们在操场上玩耍"))
    val out = fixtures.toDF("truth", "t")
      .select(col("truth"), langId(col("t")).as("pred")).collect()
    val wrong = out.filter(r => r.getString(0) != r.getString(1))
      .map(r => s"${r.getString(0)}->${r.getString(1)}")
    assert(wrong.isEmpty, s"misclassified: ${wrong.mkString(", ")}")
  }

  test("relational q_doc_langid matches the langId UDF on corpus and multilingual fixtures") {
    // The catalog query re-expresses the UDF heuristic relationally so
    // DuckDB can replay it; this pins the two forms identical — on the
    // corpus AND on text that exercises every branch (marker argmax,
    // tie-break, CJK ratio, no-hit und).
    val fixtures = Seq(
      (900001L, "xx", "the committee and the council agreed that it is in the interest of the public"),
      (900002L, "xx", "el gobierno de la ciudad aprobó los presupuestos para las escuelas"),
      (900003L, "xx", "le conseil municipal est dans une situation difficile pour les écoles"),
      (900004L, "xx", "der rat der stadt ist mit der planung nicht zufrieden"),
      (900005L, "xx", "纽约市议会批准了新的预算计划 市长表示支持 社区居民参加了听证会"),
      (900006L, "xx", ""),
      (900007L, "xx", "xyzzy plugh 12345"),
      (900008L, "xx", "la und the de der le"), // 1-1-1-1 tie → lexicographically greatest
      (900009L, "xx", "  the   \t of\nthe  ")) // ragged whitespace
    val fixDir = java.nio.file.Files.createTempDirectory("langid_fix").toString
    fixtures.toDF("doc_id", "lang", "text")
      .withColumn("source", lit("fix")).withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$fixDir/documents.parquet")
    for (dir <- Seq(sfDir, fixDir)) {
      val rel = SparkEntry.queries("q_doc_langid")(spark, dir)
        .select(col("doc_id"), col("lang_pred")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val viaUdf = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), langId(col("text")).as("p")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rel == viaUdf, s"relational != UDF on $dir")
    }
  }

  test("q_doc_langid is deterministic and stays in the known label domain") {
    val a = SparkEntry.queries("q_doc_langid")(spark, sfDir).collect()
    val b = SparkEntry.queries("q_doc_langid")(spark, sfDir).collect()
    assert(a.nonEmpty)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val domain = Set("en", "es", "fr", "de", "zh", "und")
    a.foreach(r => assert(domain.contains(r.getString(2)),
      s"unexpected prediction ${r.getString(2)}"))
  }

  test("langId handles degenerate inputs") {
    val df = Seq((1, ""), (2, "xyzzy plugh 12345"), (3, "der der der")).toDF("id", "t")
    val out = df.select(col("id"), langId(col("t")).as("p")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == "und")
    assert(out(2) == "und")
    assert(out(3) == "de")
  }
}
