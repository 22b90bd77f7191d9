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

  val all: Seq[Q] = Seq(qMultimodalDecode)
}
