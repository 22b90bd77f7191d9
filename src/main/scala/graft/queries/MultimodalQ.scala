package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.MultimodalFunctions
import graft.sources.Tables

/** Multimodal-column queries: real BinaryType payloads + the batched
  * decode plumbing, oracle-checked end-to-end (the stub decoder derives
  * metadata deterministically from payload bytes, so DuckDB reproduces
  * it from octet_length — proving the batching machinery preserves
  * row alignment and values; see MultimodalFunctions for what's stub
  * vs real).
  */
object MultimodalQ {

  /** Binary payload → batched decode → typed metadata columns. */
  val qMultimodalDecode: Q = Q.sql(
    "q_multimodal_decode",
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'png'
      |    WHEN 1 THEN 'jpeg' ELSE 'webm' END AS format,
      |  CAST(16 * (1 + octet_length(encode(text)) % 64) AS INT) AS width,
      |  CAST(9 * (1 + octet_length(encode(text)) % 48) AS INT) AS height,
      |  CAST(1 + octet_length(encode(text)) % 24 AS INT) AS n_frames
      |FROM documents
      |ORDER BY doc_id ASC""".stripMargin) { (s, d) =>
    val media = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
    MultimodalFunctions
      .mapBinaryBatches(media, "payload")(_.map(MultimodalFunctions.decodeMetaStub))
      .select(col("doc_id"),
        octet_length(col("payload")).cast(LongType).as("byte_len"),
        col("format"), col("width"), col("height"), col("n_frames"))
      .orderBy(col("doc_id").asc)
  }

  /** Frame sampling end-to-end: payload → `frameSampleStub(n=4)` →
    * posexplode → per-frame byte length. The stub's chunk arithmetic
    * is pure integer math on the payload length, so DuckDB reproduces
    * every (doc_id, frame_idx, frame_len) exactly — proving the
    * array<binary> frame column, the explode, and the byte slicing
    * keep alignment (a real video decoder replaces the slicing, not
    * the plumbing). Per-row generate; no shuffle before the sort.
    */
  val framesPerDoc = 4

  val qMultimodalFrames: Q = Q.sql(
    "q_multimodal_frames",
    s"""WITH t AS (
       |  SELECT doc_id, octet_length(encode(text)) AS len
       |  FROM documents WHERE octet_length(encode(text)) > 0),
       |f AS (
       |  SELECT doc_id, len, CAST(i AS BIGINT) AS frame_idx,
       |    greatest(1, len // $framesPerDoc) AS sz
       |  FROM t CROSS JOIN (SELECT unnest(range(0, $framesPerDoc)) AS i) u)
       |SELECT doc_id, frame_idx,
       |  CAST(least(least(frame_idx * sz, len - 1) + sz, len)
       |     - least(frame_idx * sz, len - 1) AS BIGINT) AS frame_len
       |FROM f
       |ORDER BY doc_id ASC, frame_idx ASC""".stripMargin) { (s, d) =>
    val sampleFrames = udf { p: Array[Byte] =>
      MultimodalFunctions.frameSampleStub(p, framesPerDoc)
    }
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .filter(octet_length(col("payload")) > 0)
      .select(col("doc_id"),
        posexplode(sampleFrames(col("payload"))).as(Seq("frame_idx", "frame")))
      .select(col("doc_id"), col("frame_idx").cast(LongType).as("frame_idx"),
        octet_length(col("frame")).cast(LongType).as("frame_len"))
      .orderBy(col("doc_id").asc, col("frame_idx").asc)
  }

  val all: Seq[Q] = Seq(qMultimodalDecode, qMultimodalFrames)
}
