package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQ

/** Ground truth for DSIR importance weighting (Xie et al. 2023): the λ
  * table must be deterministic and decimal-quantized, and the full
  * query path must rank documents from the target domain (the
  * lexicographically-first `source`) above off-domain documents on a
  * planted two-domain corpus — the selection behavior the paper's
  * importance resampling is for.
  */
class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  /** 60 docs, two disjoint vocabularies: source "a" (the target — min
    * source) speaks domain-A words, source "b" speaks domain-B. One
    * single-token doc and one whitespace-tailed doc pin the gram
    * edge cases (no bigrams / trailing empty token).
    */
  private lazy val planted = {
    val domA = "alpha beta gamma delta alpha beta gamma"
    val domB = "omega sigma theta kappa omega sigma theta"
    val rows = (0 until 58).map { i =>
      val src = if (i % 2 == 0) "a" else "b"
      val text = if (i % 2 == 0) s"$domA x$i" else s"$domB x$i"
      (i.toLong, text, "en", src, text.length.toLong)
    } ++ Seq(
      (58L, "alpha", "a", "en", 5L),
      (59L, "omega kappa\n", "b", "en", 12L)).map {
      case (id, t, src, lang, n) => (id, t, lang, src, n)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def fixtureDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    planted.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The trainer/scorer gram multiset, recomputed locally. */
  private def localGrams(text: String): Seq[String] = {
    val tok = graft.functions.TextFunctions.tokensLocal(text).toSeq
    tok ++ tok.sliding(2).collect { case Seq(a, b) => s"$a $b" }
  }

  test("lambda table is deterministic, 6-decimal, 2-hex-char bucketed") {
    val l1 = TextQ.dsirLambdas(planted)
    val l2 = TextQ.dsirLambdas(planted)
    assert(l1 == l2)
    assert(l1.nonEmpty && l1.size <= 256)
    assert(l1.forall(_._2.scale == 6))
    assert(l1.forall { case (b, _) => b.matches("[0-9a-f]{2}") })
    assert(l1.map(_._1) == l1.map(_._1).sorted)
  }

  test("target-domain docs out-rank off-domain docs through the full query path") {
    val out = SparkEntry.queries("q_doc_dsir")(spark, fixtureDir())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 60) // selectCount 200 > corpus: full ranking returned
    // ranking is by weight desc — every source-"a" doc (even id, plus 58)
    // must precede every source-"b" doc
    val firstB = out.indexWhere(r => r._1 % 2 == 1 && r._1 != 58L)
    val lastA = out.lastIndexWhere(r => r._1 % 2 == 0 || r._1 == 58L)
    assert(lastA < firstB,
      s"off-domain doc ranked above a target-domain doc: ${out.take(5).toSeq}")
    // weights actually separate (not all equal)
    assert(out.head._3 > out.last._3)
  }

  test("engine score replays the local Σ c_b·λ_b computation exactly") {
    val lam = TextQ.dsirLambdas(planted).toMap
    val out = SparkEntry.queries("q_doc_dsir")(spark, fixtureDir())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    for (docId <- Seq(0L, 1L, 58L, 59L)) {
      val text = planted.filter(col("doc_id") === docId)
        .select("text").as[String].head()
      val grams = localGrams(text)
      val s = grams.groupBy(g => md5Hex(g).take(2)).toSeq
        .foldLeft(java.math.BigDecimal.ZERO) { case (acc, (b, gs)) =>
          acc.add(lam(b).multiply(java.math.BigDecimal.valueOf(gs.size.toLong)))
        }
      val row = out.find(_._1 == docId).get
      assert(row._2 == grams.size.toLong, s"doc $docId n_grams")
      assert(row._3 == s.doubleValue, s"doc $docId logw")
    }
  }

  test("single-token and trailing-whitespace docs produce the expected grams") {
    // doc 58 "alpha": one unigram, no bigrams
    assert(localGrams("alpha") == Seq("alpha"))
    // doc 59 "omega kappa\n": trim is space-only, so the newline yields a
    // trailing empty token and a "kappa " bigram — same multiset the
    // DuckDB oracle builds
    assert(localGrams("omega kappa\n") ==
      Seq("omega", "kappa", "", "omega kappa", "kappa "))
  }
}
