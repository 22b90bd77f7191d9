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

  test("streaming model-based quality filter admits exactly the batch pred_keep set") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000L
    // stopword-rich vs stopword-free corpus (the QualityModelSpec
    // fixture shape) — train batch-side, filter stream-side
    val rich = "the a an the of data the a table the an merge the a scan"
    val poor = "vector window batch stream hash sort group filter join part"
    val fixture = (0 until 60).map { i =>
      (i.toLong, if (i % 2 == 0) s"$rich extra$i" else s"$poor extra$i")
    }
    val batchDocs = fixture.toDF("doc_id", "text")
    val weights = graft.functions.QualityModel.train(batchDocs)

    // batch ground truth: score every fixture doc through the catalog query
    val dir = java.nio.file.Files.createTempDirectory("smodel").toString
    batchDocs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batchKeep = SparkEntry.queries("q_doc_quality_model")(spark, dir)
      .filter(col("pred_keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(batchKeep.nonEmpty && batchKeep.size < 60)

    val stream = MemoryStream[(Long, String, Long)]
    val out = StreamingDocs.curateStream(
      stream.toDF().toDF("doc_id", "text", "ts_sec")
        .withColumn("ingest_ts", timestamp_seconds(col("ts_sec"))),
      minTokens = 1L, modelWeights = weights)
    val q = out.writeStream.format("memory").queryName("curate_model")
      .outputMode("append").start()
    try {
      stream.addData(fixture.map { case (id, text) => (id, text, t0 + id) })
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("curate_model").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batchKeep,
      s"stream/batch divergence: only-stream=${(streamed -- batchKeep).toSeq.sorted.take(5)} " +
        s"only-batch=${(batchKeep -- streamed).toSeq.sorted.take(5)}")
  }

  test("streaming LM perplexity gate admits exactly the batch under-threshold set") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000L
    // the LmPerplexitySpec contrast: even docs repeat a fixed phrase
    // (high-count bigrams), odd docs walk the same vocab in unique
    // orders (count-1 bigrams) — train batch-side, gate stream-side
    val words = (0 until 40).map(i => f"w$i%02d")
    val phrase = words.take(10).mkString(" ")
    // the doc-unique x$i suffix keeps every text distinct so the
    // stream's first-arrival dedup stage can't collapse the evens
    val fixture = (0 until 60).map { i =>
      val text =
        if (i % 2 == 0) Seq.fill(4)(phrase).mkString(" ") + s" x$i"
        else (0 until 40).map(j => words((7 + (i / 2) * 40 + j * (i / 2 + 3)) % 40))
          .mkString(" ")
      (i.toLong, text)
    }
    val dir = java.nio.file.Files.createTempDirectory("slm").toString
    fixture.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val batch = SparkEntry.queries("q_doc_lm_perplexity")(spark, dir)
      .select("doc_id", "lm_bits").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // threshold between the two populations: admitted = exactly evens
    val cut = (batch.filter(_._1 % 2 == 0).values.max +
      batch.filter(_._1 % 2 == 1).values.min) / 2
    val batchKeep = batch.filter(_._2 <= cut).keySet
    assert(batchKeep == (0 until 60 by 2).map(_.toLong).toSet)

    val stream = MemoryStream[(Long, String, Long)]
    val out = StreamingDocs.curateStream(
      stream.toDF().toDF("doc_id", "text", "ts_sec")
        .withColumn("ingest_ts", timestamp_seconds(col("ts_sec"))),
      minTokens = 1L,
      lmModel = Some(graft.queries.TextQ.lmModel(spark, dir)),
      lmMaxBits = cut)
    val q = out.writeStream.format("memory").queryName("curate_lm")
      .outputMode("append").start()
    try {
      stream.addData(fixture.map { case (id, text) => (id, text, t0 + id) })
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("curate_lm").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batchKeep,
      s"stream/batch divergence: only-stream=${(streamed -- batchKeep).toSeq.sorted.take(5)} " +
        s"only-batch=${(batchKeep -- streamed).toSeq.sorted.take(5)}")
  }

  // ------------------------------------------------------------------
  // streaming curate tail: split + per-split shard packing (foreachBatch)
  // ------------------------------------------------------------------

  /** 40 docs, no doc_id < 10 rows → the batch flagship's bench set is
    * empty, so decontamination is a no-op on BOTH sides and the parity
    * below isolates what is new here: split assignment and offset-
    * carried packing. (Streaming decontamination parity is pinned by
    * the dedicated test above.) Texts include exact-normalized dups
    * (every 7th repeats doc 10's text) and low-quality shorts (every
    * 11th), so dedup and the quality gate both fire.
    */
  private def packFixture: Seq[(Long, String)] =
    (10L until 50L).map { i =>
      val text =
        if (i % 11 == 0) "tiny doc" // quality-dropped: < 5 tokens
        else if (i % 7 == 0) // planted dup group: 14,21,28,35,42,49 → keep 14
          "duplicate body text repeated across many streamed documents here"
        else s"document $i body with ${"word " * (5 + (i % 13)).toInt}tail token${i % 3}"
      (i, text)
    }

  private def expectedBatchCurate = {
    val docs = packFixture.toDF("doc_id", "text")
    graft.queries.PipelineQ.curateDocs(docs)
      .select("doc_id", "split", "n_tokens", "shard_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  private def readPacked(dir: String) =
    spark.read.parquet(s"$dir/data")
      // partition-dir columns infer as int; normalize for the compare
      .select(col("doc_id"), col("split"), col("n_tokens"),
        col("shard_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("packing tail: carried offsets make multi-epoch packing equal the batch flagship") {
    val dir = java.nio.file.Files.createTempDirectory("stream_pack").toString
    // feed the CURATED frame (what foreachBatch receives) in doc_id
    // order, three epochs — shard ids must continue across epochs
    val curated = graft.queries.PipelineQ.curateDocs(packFixture.toDF("doc_id", "text"))
      .select("doc_id", "n_tokens") // curate output order == doc_id order
    val chunks = Seq(
      curated.filter(col("doc_id") < 25),
      curated.filter(col("doc_id") >= 25 && col("doc_id") < 40),
      curated.filter(col("doc_id") >= 40))
    chunks.zipWithIndex.foreach { case (c, e) =>
      StreamingDocs.packCuratedBatch(c, e.toLong, dir)
    }
    assert(readPacked(dir) == expectedBatchCurate,
      "multi-epoch packed tree must equal the one-pass batch flagship")
    // manifest certifies the on-disk tree: keyed by (split, shard_id),
    // token mass sums to the corpus total
    val manifest = spark.read.parquet(s"$dir/_manifest")
    val fromManifest = manifest.agg(sum("n_tokens")).head().getLong(0)
    val direct = spark.read.parquet(s"$dir/data").agg(sum("n_tokens")).head().getLong(0)
    assert(fromManifest == direct)
    assert(manifest.select("split", "shard_id").distinct().count() == manifest.count())
  }

  test("packing tail: a replayed epoch is idempotent (dynamic overwrite, offsets exclude self)") {
    val dir = java.nio.file.Files.createTempDirectory("stream_pack_replay").toString
    val curated = graft.queries.PipelineQ.curateDocs(packFixture.toDF("doc_id", "text"))
      .select("doc_id", "n_tokens")
    val e0 = curated.filter(col("doc_id") < 30)
    val e1 = curated.filter(col("doc_id") >= 30)
    StreamingDocs.packCuratedBatch(e0, 0L, dir)
    StreamingDocs.packCuratedBatch(e1, 1L, dir)
    val once = readPacked(dir)
    // crash-replay of epoch 1: foreachBatch re-fires with the same id
    StreamingDocs.packCuratedBatch(e1, 1L, dir)
    assert(readPacked(dir) == once, "replayed epoch must overwrite itself, not append")
    assert(once == expectedBatchCurate)
  }

  test("curateAndPackStream end-to-end: stream → curate → packed shard tree matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_pack_e2e").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream_pack_ckpt").toString
    val t0 = 1700000000L
    val stream = MemoryStream[(Long, String, Long)]
    val q = StreamingDocs.curateAndPackStream(
      stream.toDF().toDF("doc_id", "text", "ts_sec")
        .withColumn("ingest_ts", timestamp_seconds(col("ts_sec"))),
      dir, ckpt)
    try {
      val (a, b) = packFixture.splitAt(20)
      stream.addData(a.map { case (i, t) => (i, t, t0 + i) })
      q.processAllAvailable()
      stream.addData(b.map { case (i, t) => (i, t, t0 + i) })
      q.processAllAvailable()
    } finally q.stop()
    assert(readPacked(dir) == expectedBatchCurate,
      "ingest-time curate+pack must reproduce the batch flagship on in-order replay")
  }
}
