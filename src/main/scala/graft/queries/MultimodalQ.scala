package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{MediaContainers, MultimodalFunctions}
import graft.sources.Tables

/** Multimodal-column queries: real BinaryType payloads + the batched
  * decode plumbing, oracle-checked end-to-end.
  *
  * The decode gate round-trips REAL container bytes: per document a
  * structurally valid PNG / JPEG / GIF / WAV / MP4 / FLAC is synthesized with
  * doc_id-derived parameters (MediaContainers encoders — real CRC32s,
  * real deflate IDAT, real RIFF chunk layout), then parsed back by the
  * pure-Scala header decoder in batched mapBinaryBatches form. The
  * DuckDB oracle replays the parameter arithmetic, so a hash match
  * proves decodeMeta recovered every width/height/rate/frame-count
  * from the bytes themselves.
  */
object MultimodalQ {

  /** doc_id → synthesized container payload (real bytes, deterministic
    * parameters — the encode half of the decode gate's round trip).
    * Six-way rotation: png / jpeg / gif / wav / mp4 (the video row
    * class, round-4 verdict #3) / flac (lossless audio, bit-packed
    * STREAMINFO). The mp4 parameters use the classic QuickTime
    * timescale 600 so duration_ms exercises non-trivial integer
    * division; the flac rate 11025+25k keeps its division non-trivial
    * too.
    */
  private[graft] val mp4Timescale = 600
  private[graft] def fixturePayload(i: Long): Array[Byte] = (i % 6) match {
    case 0 => MediaContainers.pngBytes((1 + i % 64).toInt, (1 + i % 48).toInt)
    case 1 => MediaContainers.jpegBytes((1 + i % 64).toInt, (1 + i % 48).toInt)
    case 2 => MediaContainers.gifBytes((1 + i % 64).toInt, (1 + i % 48).toInt,
      (1 + i % 5).toInt)
    case 3 => MediaContainers.wavBytes((8000 + 100 * (i % 80)).toInt,
      (1 + i % 2).toInt, (1 + i % 997).toInt)
    case 4 => MediaContainers.mp4Bytes((16 * (1 + i % 120)).toInt,
      (16 * (1 + i % 68)).toInt, 1 + i % 36000, mp4Timescale,
      (1 + i % 3).toInt)
    case _ => MediaContainers.flacBytes((11025 + 25 * (i % 200)).toInt,
      (1 + i % 8).toInt, 1 + i % 44100)
  }

  /** Binary payload → batched REAL header decode → typed metadata.
    * The oracle replays the doc_id → parameter arithmetic per format,
    * including wav/mp4 duration_ms (integer division, identical in
    * both engines) and the mp4 track count.
    */
  val qMultimodalDecode: Q = Q.sql(
    "q_multimodal_decode",
    s"""SELECT doc_id,
       |  CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
       |    WHEN 2 THEN 'gif' WHEN 3 THEN 'wav' WHEN 4 THEN 'mp4'
       |    ELSE 'flac' END AS format,
       |  CAST(CASE WHEN doc_id % 6 = 3 THEN 8000 + 100 * (doc_id % 80)
       |    WHEN doc_id % 6 = 4 THEN 16 * (1 + doc_id % 120)
       |    WHEN doc_id % 6 = 5 THEN 11025 + 25 * (doc_id % 200)
       |    ELSE 1 + doc_id % 64 END AS INT) AS width,
       |  CAST(CASE WHEN doc_id % 6 = 3 THEN 1 + doc_id % 2
       |    WHEN doc_id % 6 = 4 THEN 16 * (1 + doc_id % 68)
       |    WHEN doc_id % 6 = 5 THEN 1 + doc_id % 8
       |    ELSE 1 + doc_id % 48 END AS INT) AS height,
       |  CAST(CASE doc_id % 6 WHEN 2 THEN 1 + doc_id % 5
       |    WHEN 3 THEN 1 + doc_id % 997 WHEN 4 THEN 0
       |    WHEN 5 THEN 1 + doc_id % 44100 ELSE 1 END AS INT) AS n_frames,
       |  CAST(CASE doc_id % 6
       |    WHEN 3 THEN (1 + doc_id % 997) * 1000 // (8000 + 100 * (doc_id % 80))
       |    WHEN 4 THEN (1 + doc_id % 36000) * 1000 // $mp4Timescale
       |    WHEN 5 THEN (1 + doc_id % 44100) * 1000 // (11025 + 25 * (doc_id % 200))
       |    ELSE 0 END AS BIGINT) AS duration_ms,
       |  CAST(CASE WHEN doc_id % 6 = 4 THEN 1 + doc_id % 3
       |    ELSE 1 END AS INT) AS n_tracks
       |FROM documents
       |ORDER BY doc_id ASC""".stripMargin) { (s, d) =>
    val payload = udf((i: Long) => fixturePayload(i))
    val media = Tables.documents(s, d)
      .select(col("doc_id"), payload(col("doc_id")).as("payload"))
    MultimodalFunctions
      .mapBinaryBatches(media, "payload")(_.map(MultimodalFunctions.decodeMeta))
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        col("n_frames"), col("duration_ms"), col("n_tracks"))
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
