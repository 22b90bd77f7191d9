package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_doc_source_kl: the quantized-bits KL estimator
  * is exactly 0 for sources distributed like the corpus, exactly 1 bit
  * for two disjoint half-corpus sources, and finite on the sf corpus.
  */
class SourceKlSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("skl_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("two identically-distributed sources have exactly zero KL") {
    // Both sources are x:3 y:1; corpus is x:6 y:2 — every token's
    // source-bits equals its corpus-bits, so every term is 0.
    val dir = writeDocs(Seq(
      (0L, "x x x y", "en", "src_p", 7L),
      (1L, "x x x y", "en", "src_q", 7L)))
    val out = SparkEntry.queries("q_doc_source_kl")(spark, dir).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(1) == 4L)
      assert(r.getLong(2) == 0L, s"${r.getString(0)} sum_excess_bits")
      assert(r.getDouble(3) == 0.0)
    }
  }

  test("two disjoint half-corpus sources measure exactly 1 bit each") {
    // src_u: one type x8; src_v: eight singleton types. Each source is
    // half the 16-token corpus with disjoint support -> KL = log2 2 =
    // 1 bit, which the ilog2 quantization hits exactly here.
    val dir = writeDocs(Seq(
      (0L, Seq.fill(8)("aa").mkString(" "), "en", "src_u", 23L),
      (1L, (1 to 8).map(i => s"b$i").mkString(" "), "en", "src_v", 23L)))
    val out = SparkEntry.queries("q_doc_source_kl")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("src_u") == ((8L, 8L, 1.0)))
    assert(out("src_v") == ((8L, 8L, 1.0)))
  }

  test("corpus run: one row per source, n_tokens positive, kl finite") {
    val rows = SparkEntry.queries("q_doc_source_kl")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val srcs = rows.map(_.getString(0))
    assert(srcs.distinct.length == srcs.length, "one row per source")
    rows.foreach { r =>
      assert(r.getLong(1) > 0L)
      assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite)
    }
  }
}
