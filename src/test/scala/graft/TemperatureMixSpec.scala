package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_doc_temperature_mix: the α=0.5 rebalancing
  * math on a planted 9:1 skew, the exact md5-cut survivor set, the
  * keep-everything branch for rare sources, and the subset/determinism
  * contracts on the corpus.
  */
class TemperatureMixSpec extends SparkSpecBase {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** 900 docs of src_big, 100 of src_small — raw 9:1. */
  private lazy val skewDir: String = {
    val rows = (0 until 1000).map { i =>
      val src = if (i < 900) "src_big" else "src_small"
      (i.toLong, s"doc $i text", "en", src, 10L)
    }
    val dir = java.nio.file.Files.createTempDirectory("tmix_fix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted 9:1 skew flattens toward sqrt share; survivor set is the exact md5 cut") {
    val out = SparkEntry.queries("q_doc_temperature_mix")(spark, skewDir)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    // rates: B=500, S=sqrt(900)+sqrt(100)=40 → big: 500*30/(40*900)=0.41667,
    // small: 500*10/(40*100)=1.25 → clamps to keep-all
    assert(bySrc("src_small") == 100, s"rare source must keep everything: $bySrc")
    assert(bySrc("src_big") < 500 && bySrc("src_big") > 300,
      s"big source should keep ≈41.7%: $bySrc")
    // exact survivor replay: md5 prefix < hex(floor(rate·2^32))
    val rate = (math.sqrt(900.0) * (1000.0 * 0.5)) / ((math.sqrt(900.0) + math.sqrt(100.0)) * 900.0)
    val cut = f"${math.floor(rate * 4294967296.0).toLong}%08x"
    val expectBig = (0 until 900).filter(i => md5Hex(i.toString).take(8) < cut).map(_.toLong).toSet
    assert(out.filter(_._2 == "src_big").map(_._1).toSet == expectBig,
      "engine survivor set diverges from the local md5-cut replay")
  }

  test("uniform sources keep ≈ half the corpus (budget = N/2)") {
    val out = SparkEntry.queries("q_doc_temperature_mix")(spark, sfDir).collect()
    val n = graft.sources.Tables.documents(spark, sfDir).count()
    assert(out.length > n / 4 && out.length < 3 * n / 4,
      s"kept ${out.length} of $n — expected ≈ half on a near-uniform mix")
    val again = SparkEntry.queries("q_doc_temperature_mix")(spark, sfDir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("survivors are a subset of the corpus and rebalancing preserves source coverage") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    val out = SparkEntry.queries("q_doc_temperature_mix")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(out.map(_._1).toSet.subsetOf(docs))
    val srcAll = graft.sources.Tables.documents(spark, sfDir)
      .select("source").distinct().as[String].collect().toSet
    assert(out.map(_._2).toSet == srcAll,
      "temperature sampling must never drop a source entirely")
  }
}
