package graft

import org.apache.spark.sql.functions._

import graft.sink.BandIndex
import graft.sources.Tables

/** The persistent band-key index: incremental NEAR-dup candidates
  * against a bucketed on-disk band table must (a) equal the in-memory
  * band self-join the oracle-gated q_doc_incremental_neardup runs,
  * (b) read the index side bucket-aligned with only the batch
  * shuffling, and (c) absorb appended keys without a rewrite.
  */
class BandIndexSpec extends SparkSpecBase {

  test("bucketed band index candidates match the in-memory join; index side never shuffles") {
    val banded = graft.queries.TextQ.minhashBandedFrame(spark, sfDir)
    val corpusBanded = banded.filter(col("doc_id") % 3 =!= 0)
    val batchBanded = banded.filter(col("doc_id") % 3 === 0)
    spark.sql("DROP TABLE IF EXISTS corpus_bands")
    BandIndex.build(corpusBanded, "corpus_bands")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cands = BandIndex.candidatesAgainst(spark, "corpus_bands", batchBanded)
      val got = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = batchBanded.as("a")
        .join(corpusBanded.as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
        .select(col("a.doc_id").as("batch_doc"), col("b.doc_id").as("corpus_doc"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expect,
        "index candidates must equal the in-memory band join")

      // AQE's toString prints final + initial plans; audit the final only
      val full = cands.queryExecution.executedPlan.toString
      val plan = full.split("== Initial Plan ==")(0)
      assert(plan.contains("Bucketed: true"),
        s"index side must read bucket-aligned:\n$plan")
      // exactly two shuffles: the batch side to the bucket partitioning,
      // and the (batch_doc, corpus_doc) pair dedup — the index side scan
      // feeds the join with NO Exchange
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 2,
        s"only the batch side + pair dedup may shuffle (found $exchanges):\n$plan")
      assert("Exchange[^\\n]*\\n[^\\n]*FileScan parquet".r
        .findFirstIn(plan).isEmpty,
        s"the bucketed index scan must not sit under an Exchange:\n$plan")

      // append the batch's keys: every shingled batch doc now collides
      // with itself, so the next run of the same batch sees its twin
      BandIndex.append(spark, "corpus_bands", batchBanded)
      val again = BandIndex.candidatesAgainst(spark, "corpus_bands", batchBanded)
        .filter(col("batch_doc") === col("corpus_doc")).count()
      val shingledBatch = batchBanded.select("doc_id").distinct().count()
      assert(again == shingledBatch,
        "after append, each batch doc must collide with its own keys")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS corpus_bands")
    }
  }

  test("index candidates + exact rerank reproduce the oracle-gated survivor set") {
    val banded = graft.queries.TextQ.minhashBandedFrame(spark, sfDir)
    spark.sql("DROP TABLE IF EXISTS corpus_bands2")
    BandIndex.build(banded.filter(col("doc_id") % 3 =!= 0), "corpus_bands2")
    try {
      val cands = BandIndex.candidatesAgainst(spark, "corpus_bands2",
        banded.filter(col("doc_id") % 3 === 0))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // local exact-Jaccard rerank over 3-shingle sets
      val sh = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
        .map { r =>
          val t = r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          r.getLong(0) -> t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
        }.toMap
      val hits = cands.filter { case (a, b) =>
        val (sa, sb) = (sh(a), sh(b))
        val inter = sa.intersect(sb).size.toDouble
        sa.nonEmpty && sb.nonEmpty &&
          inter / (sa.size + sb.size - inter) >= 0.5
      }.map(_._1).toSet
      val batchIds = sh.keySet.filter(_ % 3 == 0)
      val expect = (batchIds -- hits).toSeq.sorted
      val got = SparkEntry.queries("q_doc_incremental_neardup")(spark, sfDir)
        .collect().map(_.getLong(0)).toSeq
      assert(got == expect)
    } finally spark.sql("DROP TABLE IF EXISTS corpus_bands2")
  }
}
