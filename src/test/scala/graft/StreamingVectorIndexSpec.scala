package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.{IvfFunctions, PqFunctions}
import graft.sink.VectorIndex
import graft.sources.Tables
import graft.streaming.StreamingVectors

/** Streaming growth of the persistent coded vector index must be
  * (a) batch-parity: an index grown by streamed micro-batches answers
  * exactly what a one-shot build over the same corpus answers, and
  * (b) restart-idempotent: re-firing an already-applied epoch (the
  * post-crash foreachBatch replay) appends zero rows and changes no
  * answer.
  */
class StreamingVectorIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq

  test("streamed appends == one-shot build; epoch replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = IvfFunctions.trainCentroids(emb, "embedding", k = 16, seed = 42)
    val bcC = IvfFunctions.broadcastCentroids(emb, centroids)
    val resid = emb
      .withColumn("cid", IvfFunctions.assignUdf(bcC)(col("embedding")))
      .withColumn("r", IvfFunctions.residualUdf(bcC)(col("embedding"), col("cid")))
      .select(col("vec_id"), col("r"))
    val cbs = PqFunctions.trainCodebooks(resid, "r")
    val queries = emb.filter(col("vec_id") < 5)

    // seed corpus builds the index; the rest arrives as two stream epochs
    val seed = emb.filter(col("vec_id") % 3 =!= 0)
    val late = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val (epoch1, epoch2) = late.partition(_._1 % 2 == 0)

    Seq("vecidx_stream", "vecidx_stream_centroids", "vecidx_stream_codebooks",
      "vecidx_oneshot", "vecidx_oneshot_centroids", "vecidx_oneshot_codebooks")
      .foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        graft.sink.BandIndex.clearOrphanedLocation(spark, t)
      }
    VectorIndex.buildCoded(seed, "vecidx_stream", centroids, cbs)
    VectorIndex.buildCoded(emb, "vecidx_oneshot", centroids, cbs)

    val stream = MemoryStream[(Long, Seq[Float])]
    val checkpoint =
      java.nio.file.Files.createTempDirectory("vecidx_stream_ckpt").toString
    val q = StreamingVectors.indexAppendStream(
      stream.toDF().toDF("vec_id", "embedding"), "vecidx_stream", checkpoint)
    try {
      stream.addData(epoch1.toIndexedSeq)
      q.processAllAvailable()
      stream.addData(epoch2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = rows(VectorIndex.searchCoded(spark, "vecidx_stream", queries,
      emb, nProbe = 6, pqCandidates = 64, topK = 10))
    val oneshot = rows(VectorIndex.searchCoded(spark, "vecidx_oneshot", queries,
      emb, nProbe = 6, pqCandidates = 64, topK = 10))
    assert(streamed == oneshot,
      "an index grown by streamed micro-batches must answer exactly " +
        "like a one-shot build over the same corpus")

    // replay: re-fire epoch 2 directly (the post-crash foreachBatch
    // path) — zero new rows, identical answers
    val before = spark.table("vecidx_stream").count()
    VectorIndex.appendCodedIdempotent(spark, "vecidx_stream",
      epoch2.toSeq.toDF("vec_id", "embedding"))
    assert(spark.table("vecidx_stream").count() == before,
      "a replayed epoch must append zero rows")
    assert(rows(VectorIndex.searchCoded(spark, "vecidx_stream", queries,
      emb, nProbe = 6, pqCandidates = 64, topK = 10)) == streamed,
      "a replayed epoch must not change any answer")
  }
}
