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
}
