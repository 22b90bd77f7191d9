package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

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

  /** Perceptual-hash image fixture: a 9×8 grayscale scene shared by
    * each consecutive group of 4 doc_ids, each doc perturbing ONE
    * last-column pixel (row = doc_id % 4) — so same-scene images are
    * near-identical (dHash hamming ≤ 2: a col-8 bump touches only the
    * (r,7) gradient bit) and cross-scene images are pseudo-random-far.
    * All pixel math is exact positive-integer arithmetic the DuckDB
    * oracle replays verbatim; the `% 100003` keeps the 64-bit products
    * in range for any doc_id.
    */
  private[graft] val dhW = 9
  private[graft] val dhH = 8
  private[graft] def dhashFixturePixels(docId: Long): Array[Byte] = {
    val scene = (docId / 4) % 100003L
    val v = docId % 4
    val pix = new Array[Byte](dhW * dhH)
    var r = 0
    while (r < dhH) {
      var c = 0
      while (c < dhW) {
        // xor-fold the high bits in before the mod so gradient SIGNS are
        // uniform across scenes (a linear-only mix leaves most gradients
        // positive -> near-constant hashes -> band-bucket blowup)
        val m = scene * 2654435761L + (r * dhW + c) * 40503L
        val base = (m ^ (m / 65536)) % 251
        val p = if (r == v && c == 8) (base + 97) % 251 else base
        pix(r * dhW + c) = p.toByte
        c += 1
      }
      r += 1
    }
    pix
  }

  /** 64-bit dHash (difference hash): bit r*8+c set iff the horizontal
    * gradient p(r,c+1) > p(r,c) — the standard perceptual signature
    * for image near-dup (robust to brightness/scale shifts because it
    * keeps only gradient SIGNS).
    */
  private[graft] def dhash64(w: Int, pix: Array[Byte]): Long = {
    var dh = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if ((pix(r * w + c + 1) & 0xff) > (pix(r * w + c) & 0xff))
          dh |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    dh
  }

  /** Memoized (doc_id, dh) perceptual-hash table — ONE real PNG
    * encode → CRC-checked chunk walk → zlib inflate → unfilter →
    * dHash pass per corpus; the band self-join reads this checkpoint
    * for both sides instead of re-decoding.
    */
  private[graft] def dhashFrame(s: org.apache.spark.sql.SparkSession,
                                d: String): org.apache.spark.sql.DataFrame =
    SharedFrames.frame(s, s"media_dhash:$d") {
      val enc = udf((i: Long) =>
        MediaContainers.pngBytesGray(dhW, dhH, dhashFixturePixels(i)))
      val dec = udf { b: Array[Byte] =>
        val (w, _, pix) = MediaContainers.pngGrayPixels(b)
        dhash64(w, pix)
      }
      Tables.documents(s, d)
        .select(col("doc_id"), dec(enc(col("doc_id"))).as("dh"))
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    }

  /** PERCEPTUAL IMAGE NEAR-DUP — dHash + pigeonhole band-PAIR LSH +
    * exact Hamming rerank, the image-side counterpart of MinHash text
    * dedup: re-encoded/re-scraped copies of an image land within a few
    * gradient-sign bits of each other, band-bucketing finds them
    * without an all-pairs scan, and the ≤ 3 threshold is EXACT.
    *
    * EXACT-DEDUP-FIRST (round-11; the r10 sweep's 1.21/decade root
    * cause, measured): the corpus's dHash values saturate hard —
    * 500 k docs at sf10 carry only 11 280 DISTINCT hashes (the
    * fixture's scene modulus plus the hash's own entropy ceiling), so
    * identical-hash clusters average ~44 wide and the naive
    * doc-level band join shuffled 165 M candidate rows (every
    * intra-cluster pair × 4 bands) through a global dedup, for an
    * output "only" 39.75 M pairs. Near-dup structure is a function of
    * the HASH VALUE alone, so the pair search now runs on the
    * distinct hashes (thousands, at any SF where the hash saturates):
    *
    *   1. distinct dh → 4×16-bit band self-join → Hamming rerank →
    *      the tiny (h1, h2, hamming ≤ 3) hash-pair table;
    *   2. intra-hash doc pairs from a dh-co-partitioned self-join
    *      (hamming 0 by definition);
    *   3. inter-hash doc pairs by broadcasting the hash-pair table
    *      into the hash frame twice — expansion is OUTPUT-sized.
    *
    * No candidate row is ever materialized beyond the output itself,
    * and the old 165 M-row dropDuplicates disappears (intra and inter
    * sets are disjoint and internally unique by construction). The
    * residual sf-sweep exponent is OUTPUT-bound: 465 k pairs at sf1 →
    * 39.75 M at sf10 is 1.93/decade of result rows — a floor no
    * candidate scheme can cross (BENCH_NOTES r11 pins the numbers).
    *
    * The Spark side round-trips REAL bytes (pngBytesGray → CRC-checked
    * decode → unfilter → dHash); the oracle replays the pixel/bit
    * arithmetic from doc_id — a hash match proves every pixel survived
    * the codec round trip, since one wrong pixel flips output bits.
    * The oracle keeps the direct doc-level banding: both are recall-1.0
    * candidate generators for the same ≤ 3 predicate (3 flipped bits
    * across 4 bands leave ≥ 1 band untouched), so the FILTERED pair
    * set is provably identical.
    *
    * Real-world skew (one viral image × 10⁶ identical copies) lands in
    * step 2/3's expansion — output-sized, the irreducible cost of
    * asking for all pairs; emitting (hash, member-list) clusters
    * instead is the downstream-friendly contraction when N² output is
    * unwanted, exactly as the text-dedup family does.
    */
  /** The dHash arithmetic-replay oracle CTE chain, pm → ham: shared by
    * the pair query and the cluster contraction below (ham holds every
    * banded candidate pair with its exact Hamming distance).
    */
  private val dhashPairCtes: String =
    s"""pm AS (
       |  SELECT d.doc_id, r.r, c.c,
       |    ((d.doc_id // 4) % 100003) * 2654435761
       |      + (r.r * $dhW + c.c) * 40503 AS m
       |  FROM documents d, range(0, $dhH) r(r), range(0, $dhW) c(c)),
       |px AS (
       |  SELECT doc_id, r, c,
       |    CASE WHEN r = doc_id % 4 AND c = 8
       |      THEN (xor(m, m // 65536) % 251 + 97) % 251
       |      ELSE xor(m, m // 65536) % 251
       |    END AS p
       |  FROM pm),
       |bytes AS (
       |  SELECT a.doc_id, a.r,
       |    SUM(CASE WHEN b.p > a.p THEN (1 << a.c) ELSE 0 END) AS byte
       |  FROM px a JOIN px b ON a.doc_id = b.doc_id AND a.r = b.r AND b.c = a.c + 1
       |  WHERE a.c < 8
       |  GROUP BY a.doc_id, a.r),
       |banded AS (
       |  SELECT doc_id, r // 2 AS band,
       |    SUM(byte * CASE WHEN r % 2 = 0 THEN 1 ELSE 256 END) AS bv
       |  FROM bytes GROUP BY doc_id, r // 2),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
       |ham AS (
       |  SELECT c.doc_a, c.doc_b,
       |    SUM(bit_count(xor(ba.byte, bb.byte))) AS hamming
       |  FROM cand c
       |  JOIN bytes ba ON ba.doc_id = c.doc_a
       |  JOIN bytes bb ON bb.doc_id = c.doc_b AND bb.r = ba.r
       |  GROUP BY c.doc_a, c.doc_b)""".stripMargin

  /** Engine-side distinct-hash pair table (h1, h2, hamming ≤ 3): band
    * join + exact Hamming rerank over the distinct dHash values —
    * thousands of rows at any SF where the hash saturates. Shared by
    * the pair expansion and the cluster contraction.
    */
  private[graft] def dhashHashPairs(
      hashes: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val banded = hashes.select(col("dh")).distinct()
      .select(col("dh"),
        explode(transform(sequence(lit(0), lit(3)), k =>
          struct(k.as("band"),
            call_function("shiftright", col("dh"), k * lit(16))
              .bitwiseAND(lit(65535L)).as("bv")))).as("bb"))
      .select(col("dh"), col("bb.band"), col("bb.bv"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.dh") < col("b.dh"))
      .select(col("a.dh").as("h1"), col("b.dh").as("h2"),
        call_function("bit_count", col("a.dh").bitwiseXOR(col("b.dh")))
          .cast(IntegerType).as("hamming"))
      .filter(col("hamming") <= 3)
      .dropDuplicates("h1", "h2")
  }

  val qMediaDhashNearDup: Q = Q.sql(
    "q_media_dhash_neardup",
    s"""WITH $dhashPairCtes
       |SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming
       |FROM ham WHERE hamming <= 3
       |ORDER BY doc_a ASC, doc_b ASC""".stripMargin,
    doc = "Real codec round trip on the engine side, pure-arithmetic " +
      "pixel replay on the oracle side — a hash match certifies the " +
      "PNG encode/decode/unfilter/dHash chain bit-for-bit.") { (s, d) =>
    val hashes = dhashFrame(s, d)
    // step 1: pair search on DISTINCT hashes only (see scaladoc) —
    // thousands of rows, so the band join and rerank are trivial
    val hashPairs = dhashHashPairs(hashes)
    // step 2: intra-hash pairs — dh-co-partitioned self-join, exactly
    // the exact-dup clusters, hamming 0 by definition
    val intra = hashes.as("x")
      .join(hashes.as("y"),
        col("x.dh") === col("y.dh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        lit(0).as("hamming"))
    // step 3: inter-hash pairs — the tiny hash-pair table broadcasts
    // into the hash frame twice; every produced row IS an output row
    val inter = broadcast(hashPairs)
      .join(hashes.as("x"), col("x.dh") === col("h1"))
      .join(hashes.as("y"), col("y.dh") === col("h2"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"),
        col("hamming"))
    // disjoint (same-hash vs different-hash) and internally unique —
    // no global dedup needed
    intra.unionByName(inter)
      .orderBy(col("doc_a").asc, col("doc_b").asc)
  }

  /** PERCEPTUAL NEAR-DUP CLUSTERS — the contraction the pair query's
    * scaladoc promises: when the N² pair list is unwanted (a viral
    * image × 10⁶ copies makes it quadratic), downstream dedup wants
    * each doc's CLUSTER — connected components of the hamming ≤ 3
    * graph — with a deterministic representative (min doc_id) and the
    * cluster size, output linear in the corpus.
    *
    * Scale shape: the component computation runs ENTIRELY on the
    * distinct-hash graph (nodes = distinct dHashes — thousands at any
    * SF where the hash saturates; edges = the memoized-pair-search
    * hash pairs), then docs label themselves with one broadcast join.
    * Identical-hash docs share a node, so intra-hash connectivity is
    * free; a hash outside every pair is its own component. No doc-pair
    * edge is ever materialized. The oracle replays components over the
    * DOC-pair graph with a recursive closure — provably the same
    * partition, since doc pairs connect exactly docs whose hashes are
    * equal or band-paired.
    */
  val qMediaDhashClusters: Q = Q.sql(
    "q_media_dhash_clusters",
    s"""WITH RECURSIVE $dhashPairCtes,
       |prs AS (SELECT doc_a, doc_b FROM ham WHERE hamming <= 3),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM prs
       |  UNION ALL SELECT doc_b, doc_a FROM prs),
       |reach AS (
       |  SELECT DISTINCT src AS doc_id, src AS r FROM edges
       |  UNION
       |  SELECT w.doc_id, e.dst FROM reach w JOIN edges e ON w.r = e.src),
       |comp AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
       |sizes AS (SELECT cluster_id, COUNT(*) AS n FROM comp GROUP BY cluster_id)
       |SELECT c.doc_id, CAST(c.cluster_id AS BIGINT) AS cluster_id,
       |  CAST(s.n AS BIGINT) AS cluster_size
       |FROM comp c JOIN sizes s ON c.cluster_id = s.cluster_id
       |WHERE s.n >= 2
       |ORDER BY doc_id ASC""".stripMargin,
    doc = "Cluster contraction of the dhash near-dup graph: engine " +
      "components run on the distinct-hash graph (thousands of " +
      "nodes), oracle replays them over doc pairs — same partition " +
      "by construction.") { (s, d) =>
    val hashes = dhashFrame(s, d)
    // components over the hash graph: h1/h2 are the only edges; a dh
    // in no pair stays its own component via the coalesce below.
    // comp labels are hash values (min of component) — they cannot
    // collide with a pair-free hash's own dh, because every label IS
    // some paired hash's value and dh values are distinct.
    val comp = PipelineQ.connectedComponents(
      dhashHashPairs(hashes).select(col("h1").as("src"), col("h2").as("dst")))
      .toDF("dh", "comp")
    val labeled = hashes.join(broadcast(comp), Seq("dh"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("dh")).as("comp"))
    val clusters = labeled.groupBy("comp")
      .agg(min("doc_id").as("cluster_id"), count(lit(1)).as("cluster_size"))
      .filter(col("cluster_size") >= 2)
    labeled.join(broadcast(clusters), Seq("comp"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy(col("doc_id").asc)
  }

  /** Source dims and shrink factor for [[qResize]] — 32×24 by 4×4
    * blocks → 8×6 (exact integer factors, so the box filter has no
    * edge remainder to special-case).
    */
  private[graft] val rsW = 32
  private[graft] val rsH = 24
  private[graft] val rsF = 4

  /** (doc_id) → 32×24 grayscale source image for the resize gate —
    * the same xor-fold mix as [[dhashFixturePixels]], unperturbed
    * (resize needs pixel variety, not planted near-duplicates).
    */
  private[graft] def resizeFixturePixels(docId: Long): Array[Byte] = {
    val key = docId % 100003L
    val pix = new Array[Byte](rsW * rsH)
    var r = 0
    while (r < rsH) {
      var c = 0
      while (c < rsW) {
        val m = key * 2654435761L + (r * rsW + c) * 40503L
        pix(r * rsW + c) = ((m ^ (m / 65536)) % 251).toByte
        c += 1
      }
      r += 1
    }
    pix
  }

  /** REAL IMAGE RESIZE — the previously-stubbed member of the
    * multimodal quartet (decode / feature-extract / frame-sample /
    * resize) made real for the format the engine fully decodes: per
    * document, a 32×24 grayscale PNG round-trips
    * encode → CRC-checked decode → exact 4×4 box-filter downsample
    * ([[MultimodalFunctions.boxResizeGray]], floor-average integer
    * arithmetic) → RE-ENCODE at 8×6 → decode AGAIN, and the reported
    * stats come off that second decode — so a hash match certifies
    * the resample kernel AND both codec round trips (width/height are
    * read back from the re-encoded header, not assumed).
    *
    * Scale shape: pure per-row binary work fused in the scan, one
    * output row per document, no shuffle before the sort — the same
    * mapper class as the decode gate. ORACLE REPLAY: DuckDB recomputes
    * the source pixels from doc_id, the 4×4 floor-average blocks, and
    * the output stats.
    */
  val qResize: Q = Q.sql(
    "q_multimodal_resize",
    s"""WITH pm AS (
       |  SELECT d.doc_id, r.r, c.c,
       |    (d.doc_id % 100003) * 2654435761
       |      + (r.r * $rsW + c.c) * 40503 AS m
       |  FROM documents d, range(0, $rsH) r(r), range(0, $rsW) c(c)),
       |px AS (
       |  SELECT doc_id, r, c, xor(m, m // 65536) % 251 AS p FROM pm),
       |op AS (
       |  SELECT doc_id, r // $rsF AS orow, c // $rsF AS ocol,
       |    SUM(p) // ${rsF * rsF} AS q
       |  FROM px GROUP BY doc_id, r // $rsF, c // $rsF)
       |SELECT doc_id,
       |  CAST(${rsW / rsF} AS INT) AS out_w, CAST(${rsH / rsF} AS INT) AS out_h,
       |  CAST(SUM(q) AS BIGINT) AS p_sum,
       |  CAST(MIN(q) AS BIGINT) AS p_min, CAST(MAX(q) AS BIGINT) AS p_max
       |FROM op GROUP BY doc_id
       |ORDER BY doc_id ASC""".stripMargin,
    doc = "Real resize gate: encode -> decode -> box resample -> " +
      "re-encode -> decode, stats off the second decode; oracle " +
      "replays the integer pixel arithmetic.") { (s, d) =>
    val enc = udf((i: Long) =>
      MediaContainers.pngBytesGray(rsW, rsH, resizeFixturePixels(i)))
    val resizeStats = udf { b: Array[Byte] =>
      val (w, h, pix) = MediaContainers.pngGrayPixels(b)
      val (ow, oh, small) = MultimodalFunctions.boxResizeGray(w, h, pix, rsF, rsF)
      val (w2, h2, pix2) =
        MediaContainers.pngGrayPixels(MediaContainers.pngBytesGray(ow, oh, small))
      var mn = 255L; var mx = 0L; var sm = 0L
      pix2.foreach { pb =>
        val v = (pb & 0xff).toLong
        if (v < mn) mn = v
        if (v > mx) mx = v
        sm += v
      }
      (w2, h2, sm, mn, mx)
    }
    Tables.documents(s, d)
      .select(col("doc_id"), resizeStats(enc(col("doc_id"))).as("st"))
      .select(col("doc_id"), col("st._1").as("out_w"), col("st._2").as("out_h"),
        col("st._3").as("p_sum"), col("st._4").as("p_min"), col("st._5").as("p_max"))
      .orderBy(col("doc_id").asc)
  }

  /** Frames per synthetic video for [[qSceneCuts]] (every 6th doc —
    * the mp4 class of the decode fixture's format rotation — is a
    * video).
    */
  private[graft] val sceneFrames = 6

  /** (doc_id, frame) → 9×8 grayscale frame pixels with TEMPORAL
    * structure: a deterministic cut predicate ((doc_id + 37·k) % 3 = 0
    * at frame k ≥ 1) partitions the frame sequence into segments; all
    * frames of a segment render the same scene (keyed by
    * doc_id·7 + seg·13, same xor-fold mix as [[dhashFixturePixels]])
    * with a one-pixel per-frame jitter (row = frame % 8, col 8 — one
    * gradient bit, so intra-scene adjacent frames sit at Hamming ≤ 2),
    * while consecutive segments render independent scenes
    * (pseudo-random-far hashes). Exact positive-integer arithmetic
    * throughout — the oracle replays it verbatim.
    */
  private[graft] def sceneCutPixels(docId: Long, f: Int): Array[Byte] = {
    var seg = 0L
    var k = 1
    while (k <= f) {
      if ((docId + 37L * k) % 3 == 0) seg += 1
      k += 1
    }
    val scene = (docId * 7 + seg * 13) % 100003L
    val pix = new Array[Byte](dhW * dhH)
    var r = 0
    while (r < dhH) {
      var c = 0
      while (c < dhW) {
        val m = scene * 2654435761L + (r * dhW + c) * 40503L
        val base = (m ^ (m / 65536)) % 251
        val p = if (r == f % 8 && c == 8) (base + 97) % 251 else base
        pix(r * dhW + c) = p.toByte
        c += 1
      }
      r += 1
    }
    pix
  }

  /** VIDEO SCENE-CUT DETECTION — the temporal member of the perceptual
    * family: per video, dHash every sampled frame and report a cut
    * wherever the ADJACENT-frame Hamming distance exceeds the near-dup
    * threshold (> 3 — the complement of the ≤ 3 "same image" contract
    * the pair/cluster queries use). This is the standard
    * shot-boundary primitive (frame-difference thresholding on a
    * perceptual signature): dedup-by-scene, thumbnail selection, and
    * per-shot sampling all start from this table.
    *
    * Scale shape: the frame expansion is a bounded ×[[sceneFrames]]
    * explode fused in the scan; each frame pays one REAL
    * PNG encode → CRC-checked decode → unfilter → dHash round trip
    * (the same codec gate as the near-dup query); the only exchange
    * is the per-video lag window (partition by doc_id — millions of
    * independent small partitions), and the output is cut rows only.
    * No joins, no candidate pairs — linear at any SF.
    *
    * ORACLE REPLAY: DuckDB recomputes the cut→segment prefix sum, the
    * per-frame pixel/bit arithmetic (same xor-fold mix as
    * [[dhashPairCtes]]), per-row gradient bytes, and the adjacent-frame
    * byte-wise Hamming sum — a hash match certifies the whole temporal
    * chain, since one wrong pixel in any frame flips some cut's
    * distance.
    */
  val qSceneCuts: Q = Q.sql(
    "q_media_scene_cuts",
    s"""WITH vids AS (
       |  SELECT doc_id FROM documents WHERE doc_id % 6 = 4),
       |fl AS (
       |  SELECT doc_id, f.f,
       |    CASE WHEN f.f >= 1 AND (doc_id + 37 * f.f) % 3 = 0
       |      THEN 1 ELSE 0 END AS cutf
       |  FROM vids, range(0, $sceneFrames) f(f)),
       |sg AS (
       |  SELECT doc_id, f,
       |    SUM(cutf) OVER (PARTITION BY doc_id ORDER BY f) AS seg
       |  FROM fl),
       |pm AS (
       |  SELECT doc_id, f, r.r, c.c,
       |    ((doc_id * 7 + seg * 13) % 100003) * 2654435761
       |      + (r.r * $dhW + c.c) * 40503 AS m
       |  FROM sg, range(0, $dhH) r(r), range(0, $dhW) c(c)),
       |px AS (
       |  SELECT doc_id, f, r, c,
       |    CASE WHEN r = f % 8 AND c = 8
       |      THEN (xor(m, m // 65536) % 251 + 97) % 251
       |      ELSE xor(m, m // 65536) % 251
       |    END AS p
       |  FROM pm),
       |bytes AS (
       |  SELECT a.doc_id, a.f, a.r,
       |    SUM(CASE WHEN b.p > a.p THEN (1 << a.c) ELSE 0 END) AS byte
       |  FROM px a JOIN px b
       |    ON a.doc_id = b.doc_id AND a.f = b.f AND a.r = b.r AND b.c = a.c + 1
       |  WHERE a.c < 8
       |  GROUP BY a.doc_id, a.f, a.r),
       |ham AS (
       |  SELECT a.doc_id, a.f AS frame_idx,
       |    SUM(bit_count(xor(a.byte, b.byte))) AS hamming
       |  FROM bytes a JOIN bytes b
       |    ON a.doc_id = b.doc_id AND b.f = a.f - 1 AND a.r = b.r
       |  GROUP BY a.doc_id, a.f)
       |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |  CAST(hamming AS INT) AS hamming
       |FROM ham WHERE hamming > 3
       |ORDER BY doc_id ASC, frame_idx ASC""".stripMargin,
    doc = "Temporal perceptual segmentation: real per-frame codec " +
      "round trip on the engine side, pure-arithmetic replay of the " +
      "segment/pixel/Hamming chain on the oracle side.") { (s, d) =>
    val enc = udf((i: Long, f: Int) =>
      MediaContainers.pngBytesGray(dhW, dhH, sceneCutPixels(i, f)))
    val dec = udf { b: Array[Byte] =>
      val (w, _, pix) = MediaContainers.pngGrayPixels(b)
      dhash64(w, pix)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("f").asc)
    Tables.documents(s, d)
      .filter(col("doc_id") % 6 === 4)
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(sceneFrames - 1))).as("f"))
      .select(col("doc_id"), col("f"),
        dec(enc(col("doc_id"), col("f"))).as("dh"))
      .withColumn("prev", lag(col("dh"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("doc_id"), col("f").cast(LongType).as("frame_idx"),
        call_function("bit_count", col("dh").bitwiseXOR(col("prev")))
          .cast(IntegerType).as("hamming"))
      .filter(col("hamming") > 3)
      .orderBy(col("doc_id").asc, col("frame_idx").asc)
  }

  /** Audio-feature window (samples per analysis frame). 256 keeps the
    * per-window integer sums far inside int64 (|s| ≤ 1000 →
    * sq_sum ≤ 2.56e8).
    */
  private[graft] val audioWindow = 256

  /** doc_id → planted PCM signal: a full-swing pseudo-sawtooth
    * s_n = ((doc_id·31 + n·17) mod 2001) − 1000, 600 + doc_id%1000
    * samples — integer-exact, sign-rich (zero crossings exercise the
    * signed decode), unique per document.
    */
  private[graft] def audioFixtureSamples(docId: Long): Array[Short] = {
    val n = (600 + docId % 1000).toInt
    Array.tabulate(n)(i => (((docId * 31 + i.toLong * 17) % 2001) - 1000).toShort)
  }

  /** PER-WINDOW AUDIO FEATURE EXTRACTION — the audio half of the
    * multimodal pipeline: payload → REAL RIFF/PCM decode
    * ([[MediaContainers.wavPcmSamples]]: chunk walk, little-endian
    * signed 16-bit words) → fixed 256-sample analysis windows →
    * energy (|s| sum, s² sum), peak, and zero-crossing count per
    * window. These are the standard cheap features (energy + ZCR)
    * a speech/music triage stage computes before any model runs;
    * sums stay integer so the round trip is bit-exact. A real build
    * swaps the feature kernel for FFT/MFCC over the SAME decoded
    * window stream — the plumbing (binary column → per-row decode →
    * window explode → typed feature rows) is what this query pins.
    *
    * Scale shape: pure per-row work (synthesize/decode/window inside
    * the scan projection, Generate for the explode) — zero shuffles
    * before the output sort; at 100 TB this is a mapper over the
    * media column, exactly like the image decode family. ORACLE
    * REPLAY: DuckDB regenerates the planted signal from doc_id
    * (correlated unnest) and re-aggregates the identical integer
    * features — a hash match proves every sample survived the
    * encode → byte walk → sign-extension round trip, since one
    * wrong sample shifts a window's sums.
    */
  val qAudioFeatures: Q = Q.sql(
    "q_multimodal_audio_features",
    s"""WITH t AS (
       |  SELECT doc_id, 600 + doc_id % 1000 AS n_total FROM documents),
       |s AS (
       |  SELECT doc_id, unnest(range(0, n_total)) AS n FROM t),
       |v AS (
       |  SELECT doc_id, n, n // $audioWindow AS window_idx,
       |    ((doc_id * 31 + n * 17) % 2001) - 1000 AS v,
       |    CASE WHEN n % $audioWindow <> 0
       |      THEN ((doc_id * 31 + (n - 1) * 17) % 2001) - 1000 END AS pv
       |  FROM s)
       |SELECT doc_id, CAST(window_idx AS BIGINT) AS window_idx,
       |  COUNT(*) AS n_samples,
       |  CAST(SUM(ABS(v)) AS BIGINT) AS abs_sum,
       |  CAST(SUM(v * v) AS BIGINT) AS sq_sum,
       |  CAST(MAX(ABS(v)) AS BIGINT) AS peak,
       |  CAST(SUM(CASE WHEN pv IS NOT NULL AND (v < 0) <> (pv < 0)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
       |FROM v GROUP BY 1, 2
       |ORDER BY doc_id ASC, window_idx ASC""".stripMargin) { (s, d) =>
    val enc = udf((i: Long) => MediaContainers.wavBytesPcm(
      (8000 + 100 * (i % 80)).toInt, audioFixtureSamples(i)))
    val feat = udf { b: Array[Byte] =>
      val (_, smp) = MediaContainers.wavPcmSamples(b)
      val nw = (smp.length + audioWindow - 1) / audioWindow
      (0 until nw).map { w =>
        val start = w * audioWindow
        val end = math.min(smp.length, start + audioWindow)
        var absSum = 0L; var sqSum = 0L; var peak = 0L; var zc = 0L
        var i = start
        while (i < end) {
          val v = smp(i).toLong
          val a = math.abs(v)
          absSum += a; sqSum += v * v
          if (a > peak) peak = a
          if (i > start && (v < 0) != (smp(i - 1) < 0)) zc += 1
          i += 1
        }
        ((end - start).toLong, absSum, sqSum, peak, zc)
      }
    }
    Tables.documents(s, d)
      .select(col("doc_id"), feat(enc(col("doc_id"))).as("ws"))
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("window_idx", "w")))
      .select(col("doc_id"), col("window_idx").cast(LongType).as("window_idx"),
        col("w._1").as("n_samples"), col("w._2").as("abs_sum"),
        col("w._3").as("sq_sum"), col("w._4").as("peak"),
        col("w._5").as("zero_crossings"))
      .orderBy(col("doc_id").asc, col("window_idx").asc)
  }

  /** PER-IMAGE PIXEL STATISTICS — the image-triage mapper that runs
    * before any expensive vision model: luminance min/max/sum, dark
    * and bright pixel counts, and contrast, computed from REAL codec
    * output (pngBytesGray encode → CRC-checked chunk walk → zlib
    * inflate → unfilter → per-pixel ints). A near-black or
    * zero-contrast scan is dropped here for the cost of a scan, not a
    * GPU batch. All integer aggregates; the oracle replays the pixel
    * formula from doc_id, so a hash match certifies every pixel
    * survived the codec round trip.
    *
    * Scale shape: pure per-row binary work fused in the scan, one
    * docs-sized output row per image, no shuffle before the sort —
    * the same mapper class as the decode/audio-feature gates.
    */
  val qPixelStats: Q = Q.sql(
    "q_multimodal_pixel_stats",
    s"""WITH pm AS (
       |  SELECT d.doc_id, r.r, c.c,
       |    ((d.doc_id // 4) % 100003) * 2654435761
       |      + (r.r * $dhW + c.c) * 40503 AS m
       |  FROM documents d, range(0, $dhH) r(r), range(0, $dhW) c(c)),
       |px AS (
       |  SELECT doc_id, r, c,
       |    CASE WHEN r = doc_id % 4 AND c = 8
       |      THEN (xor(m, m // 65536) % 251 + 97) % 251
       |      ELSE xor(m, m // 65536) % 251
       |    END AS p
       |  FROM pm)
       |SELECT doc_id,
       |  CAST(MIN(p) AS BIGINT) AS p_min, CAST(MAX(p) AS BIGINT) AS p_max,
       |  CAST(SUM(p) AS BIGINT) AS p_sum,
       |  CAST(SUM(CASE WHEN p < 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_dark,
       |  CAST(SUM(CASE WHEN p >= 192 THEN 1 ELSE 0 END) AS BIGINT) AS n_bright,
       |  CAST(MAX(p) - MIN(p) AS BIGINT) AS contrast
       |FROM px GROUP BY doc_id
       |ORDER BY doc_id ASC""".stripMargin) { (s, d) =>
    val enc = udf((i: Long) =>
      MediaContainers.pngBytesGray(dhW, dhH, dhashFixturePixels(i)))
    val stats = udf { b: Array[Byte] =>
      val (_, _, pix) = MediaContainers.pngGrayPixels(b)
      var mn = 255L; var mx = 0L; var sm = 0L; var dark = 0L; var bright = 0L
      pix.foreach { pb =>
        val v = (pb & 0xff).toLong
        if (v < mn) mn = v
        if (v > mx) mx = v
        sm += v
        if (v < 64) dark += 1
        if (v >= 192) bright += 1
      }
      (mn, mx, sm, dark, bright, mx - mn)
    }
    Tables.documents(s, d)
      .select(col("doc_id"), stats(enc(col("doc_id"))).as("st"))
      .select(col("doc_id"), col("st._1").as("p_min"), col("st._2").as("p_max"),
        col("st._3").as("p_sum"), col("st._4").as("n_dark"),
        col("st._5").as("n_bright"), col("st._6").as("contrast"))
      .orderBy(col("doc_id").asc)
  }

  val all: Seq[Q] = Seq(qMultimodalDecode, qMultimodalFrames, qMediaDhashNearDup,
    qMediaDhashClusters, qSceneCuts, qResize, qAudioFeatures, qPixelStats)
}
