package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_doc_epoch_mix: fractional-epoch realization on a
  * planted 9:1 char-mass skew — the under-represented source repeats
  * (integral epochs > 1, no md5 jitter), the over-represented source
  * down-samples to the exact md5-cut survivor set, copies are
  * contiguous, and the result is deterministic.
  */
class EpochMixSpec extends SparkSpecBase {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** 900 docs × 10 chars of src_big, 100 docs × 10 chars of src_small:
    * fair share = 5000 chars/source → src_big epochs = 5000/9000 ≈
    * 0.5556 (pure fractional sample), src_small epochs = 5000/1000 = 5
    * (exactly five full copies, fractional part 0).
    */
  private lazy val skewDir: String = {
    val rows = (0 until 1000).map { i =>
      val src = if (i < 900) "src_big" else "src_small"
      (i.toLong, s"doc $i text", "en", src, 10L)
    }
    val dir = java.nio.file.Files.createTempDirectory("emix_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("integral epochs repeat every doc exactly; fractional epochs replay the md5 cut") {
    val out = SparkEntry.queries("q_doc_epoch_mix")(spark, skewDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val small = out.filter(_._2 == "src_small")
    // epochs = 5 exactly: every src_small doc appears 5 times, copies 0..4
    assert(small.groupBy(_._1).forall { case (_, copies) =>
      copies.map(_._3).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L)
    }, "src_small docs must carry exactly copies 0..4")
    assert(small.map(_._1).distinct.length == 100)
    // src_big: 0 full copies + md5 cut at frac((10000/2)/9000)
    val rate = (10000.0 / 2.0) / 9000.0
    val cut = f"${math.floor((rate - math.floor(rate)) * 4294967296.0).toLong}%08x"
    val expectBig = (0 until 900)
      .filter(i => md5Hex(i.toString).take(8) < cut).map(_.toLong).toSet
    val big = out.filter(_._2 == "src_big")
    assert(big.forall(_._3 == 0L), "fractional-only source has single copies")
    assert(big.map(_._1).toSet == expectBig,
      "engine survivor set diverges from the local md5-cut replay")
  }

  test("expected char mass: the repeated source realizes its fair share exactly") {
    val out = SparkEntry.queries("q_doc_epoch_mix")(spark, skewDir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // src_small: 100 docs × 5 copies × 10 chars = 5000 = fair share, exact
    assert(out("src_small") == 500L)
  }

  test("corpus run: deterministic, every source retained, copy ids well-formed") {
    val q = SparkEntry.queries("q_doc_epoch_mix")
    val out = q(spark, sfDir).collect().map(_.toString)
    assert(out.sameElements(q(spark, sfDir).collect().map(_.toString)))
    val df = q(spark, sfDir)
    val srcAll = graft.sources.Tables.documents(spark, sfDir)
      .select("source").distinct().as[String].collect().toSet
    assert(df.select("source").distinct().as[String].collect().toSet == srcAll,
      "epoch mixing must never drop a source entirely")
    // copies per doc are contiguous 0..n-1
    val bad = df.groupBy("doc_id")
      .agg(max("copy").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n") - 1).count()
    assert(bad == 0, "copy ids must be contiguous per doc")
  }
}
