package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sink.BandIndex
import graft.streaming.StreamingDocs

/** The streaming near-dup ingest gate must (a) drop exactly the
  * streamed docs whose MinHash bands collide with the persistent
  * corpus index (batch-parity with the in-memory band join), (b) pass
  * unshingleable short docs, and (c) run with ZERO streaming state —
  * the index is the state.
  */
class StreamingNearDupGateSpec extends SparkSpecBase {
  import spark.implicits._

  test("gate drops band-colliding docs, passes novel + short docs, holds no state") {
    implicit val sqlCtx = spark.sqlContext
    // corpus: two docs; batch: 10 = near-copy of corpus doc 0 (one word
    // changed deep in), 11 = novel text, 12 = too short to shingle
    val corpus = Seq(
      (0L, (1 to 30).map(i => s"alpha$i").mkString(" "), "en", "s0", 100L),
      (1L, (1 to 30).map(i => s"beta$i").mkString(" "), "en", "s0", 100L))
    val corpusDir = java.nio.file.Files.createTempDirectory("ndg_corpus").toString
    corpus.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    spark.sql("DROP TABLE IF EXISTS ndg_bands")
    BandIndex.build(graft.queries.TextQ.minhashBandedFrame(spark, corpusDir),
      "ndg_bands")

    val batch = Seq(
      (10L, ((1 to 29).map(i => s"alpha$i") :+ "CHANGED").mkString(" ")),
      (11L, (1 to 30).map(i => s"nu$i").mkString(" ")),
      (12L, "too short"))

    // expected survivors from the batch-side band join (parity oracle)
    val batchDir = java.nio.file.Files.createTempDirectory("ndg_batch").toString
    batch.map { case (i, t) => (i, t, "en", "s1", 50L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$batchDir/documents.parquet")
    val hitDocs = graft.queries.TextQ.minhashBandedFrame(spark, batchDir).as("a")
      .join(spark.table("ndg_bands").as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
      .select(col("a.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(hitDocs.contains(10L), "the near-copy must band-collide")
    val expected = batch.map(_._1).toSet -- hitDocs

    val stream = MemoryStream[(Long, String)]
    val out = StreamingDocs.neardupGateStream(
      stream.toDF().toDF("doc_id", "text"), "ndg_bands")
    val q = out.writeStream.format("memory").queryName("ndg_out")
      .outputMode("append").start()
    try {
      stream.addData(batch)
      q.processAllAvailable()
      val got = spark.table("ndg_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(got == expected, s"survivors $got != batch-parity $expected")
      assert(got.contains(12L), "short docs must pass (null band keys)")
      assert(!got.contains(10L), "near-copy must be gated out")
      // stateless: no state store operators ran
      val prog = q.lastProgress
      assert(prog.stateOperators.isEmpty,
        s"gate must hold no streaming state: ${prog.stateOperators.mkString}")
    } finally q.stop()
  }
}
