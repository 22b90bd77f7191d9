package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDocs

/** Ingest-time curation: the streaming pipeline must apply the same
  * normalize/quality/dedup rules as the batch q_doc_curate stages, with
  * first-arrival-wins dedup across micro-batches inside the watermark
  * horizon.
  */
class StreamingDocsSpec extends SparkSpecBase {
  import spark.implicits._

  private case class Doc(doc_id: Long, text: String, ts_sec: Long)

  test("streaming curation: quality gate drops, cross-batch normalized dups drop") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000L
    val stream = MemoryStream[(Long, String, Long)]
    val out = StreamingDocs.curateStream(
      stream.toDF().toDF("doc_id", "text", "ts_sec")
        .withColumn("ingest_ts", timestamp_seconds(col("ts_sec"))))
    val q = out.writeStream.format("memory").queryName("curate_stream")
      .outputMode("append").start()
    try {
      // batch 1
      stream.addData(Seq(
        (1L, "café one two three four five", t0),
        (3L, "too short here", t0 + 1), // quality-dropped (< 5 tokens)
        (5L, "alpha beta gamma delta epsilon zeta", t0 + 2)))
      q.processAllAvailable()
      // batch 2: doc 2 equals doc 1 AFTER normalization (decomposed é,
      // messy whitespace) → dedup state spans micro-batches
      stream.addData(Seq(
        (2L, " cafe\u0301  one	two  three four five ", t0 + 60),
        (6L, "eta theta iota kappa lambda mu", t0 + 61)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("curate_stream")
      .select("doc_id", "norm_text", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 5L, 6L),
      s"expected docs {1,5,6} to survive, got ${rows.toSeq}")
    // doc 1's normalized text is what doc 2 was deduped against
    assert(rows.head._2 == "café one two three four five")
    assert(rows.forall(_._3 == 6L))
  }

  test("streaming decontamination: bench-gram overlap drops at ingest, stateless") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000L
    val bench = "alpha beta gamma delta epsilon zeta eta theta"
    // bench set derived exactly like the batch stage, from a static frame
    val benchDocs = Seq((0L, bench), (1L, s"$bench zero one two"))
      .toDF("doc_id", "text")
    val grams = StreamingDocs.benchGramSet(benchDocs, maxDocId = 10L)
    assert(grams.contains("alpha beta gamma delta epsilon"))

    val stream = MemoryStream[(Long, String, Long)]
    val out = StreamingDocs.curateStream(
      stream.toDF().toDF("doc_id", "text", "ts_sec")
        .withColumn("ingest_ts", timestamp_seconds(col("ts_sec"))),
      benchGrams = grams)
    val q = out.writeStream.format("memory").queryName("curate_decontam")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        (20L, s"prefix words $bench suffix words here", t0), // bench 5-gram -> dropped
        (21L, "beta gamma delta epsilon zeta trailing tail", t0 + 1), // shifted gram -> dropped
        (22L, "completely clean document with many distinct tokens", t0 + 2),
        (23L, "alpha beta gamma clean three gram only survives fine", t0 + 3)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("curate_decontam").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(22L, 23L),
      s"expected contaminated 20/21 dropped, clean 22/23 kept; got $ids")
  }
}
