package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

import graft.functions.MediaContainers
import graft.queries.MultimodalQ

/** Ground truth for q_media_dhash_neardup and the PNG pixel codec it
  * rides: byte-exact encode→decode round trip, unfiltering of ALL five
  * PNG filter types against an independently-written encoder, CRC
  * tamper rejection, and the planted same-scene near-dup contract.
  */
class MediaDhashSpec extends SparkSpecBase {

  private def fixturePix(seed: Int, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((seed * 31 + i * 17) % 256).toByte)

  test("pngBytesGray -> pngGrayPixels round-trips every pixel byte-exactly") {
    val pix = fixturePix(7, 9, 8)
    val (w, h, got) = MediaContainers.pngGrayPixels(
      MediaContainers.pngBytesGray(9, 8, pix))
    assert(w == 9 && h == 8)
    assert(got.sameElements(pix))
  }

  /** Independent PNG writer (chunk CRCs + deflate done here, not via
    * MediaContainers) that FILTERS each scanline with a chosen type —
    * proving the decoder's unfilter logic, not just our encoder's
    * filter-0 path.
    */
  private def filteredPng(w: Int, h: Int, pix: Array[Byte],
                          filterOf: Int => Int): Array[Byte] = {
    val raw = new Array[Byte](h * (w + 1))
    for (r <- 0 until h) {
      val ft = filterOf(r)
      raw(r * (w + 1)) = ft.toByte
      for (c <- 0 until w) {
        val x = pix(r * w + c) & 0xff
        val a = if (c > 0) pix(r * w + c - 1) & 0xff else 0
        val u = if (r > 0) pix((r - 1) * w + c) & 0xff else 0
        val ul = if (r > 0 && c > 0) pix((r - 1) * w + c - 1) & 0xff else 0
        val enc = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - u
          case 3 => x - (a + u) / 2
          case 4 =>
            val p = a + u - ul
            val pa = math.abs(p - a); val pb = math.abs(p - u); val pc = math.abs(p - ul)
            x - (if (pa <= pb && pa <= pc) a else if (pb <= pc) u else ul)
        }
        raw(r * (w + 1) + 1 + c) = (enc & 0xff).toByte
      }
    }
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new CRC32(); crc.update(tb); crc.update(data)
      val c = crc.getValue
      out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
    }
    val ihdr = new Array[Byte](13)
    ihdr(3) = w.toByte; ihdr(7) = h.toByte; ihdr(8) = 8
    chunk("IHDR", ihdr)
    val d = new Deflater(); d.setInput(raw); d.finish()
    val buf = new Array[Byte](8192); val idat = new ByteArrayOutputStream()
    while (!d.finished()) idat.write(buf, 0, d.deflate(buf))
    d.end()
    chunk("IDAT", idat.toByteArray)
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  test("decoder unfilters all five PNG filter types (Sub/Up/Average/Paeth)") {
    val pix = fixturePix(13, 8, 10)
    // row r uses filter r % 5 — every type exercised, including chained
    // dependencies on previously-reconstructed rows
    val png = filteredPng(8, 10, pix, r => r % 5)
    val (_, _, got) = MediaContainers.pngGrayPixels(png)
    assert(got.sameElements(pix), "unfilter must reconstruct the original pixels")
  }

  test("a corrupted IDAT byte fails the CRC check, not silently decodes") {
    val png = MediaContainers.pngBytesGray(9, 8, fixturePix(3, 9, 8))
    // flip one byte inside the IDAT payload (sig 8 + IHDR 25 + len/typ 8 = 41)
    png(45) = (png(45) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException](MediaContainers.pngGrayPixels(png))
    assert(e.getMessage.contains("CRC"))
  }

  test("same-scene fixture images are dHash-near: every cluster pair recalled") {
    val rows = SparkEntry.queries("q_media_dhash_neardup")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 3)
    }
    val found = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall contract: all same-scene pairs (hamming <= 2 by fixture
    // design, <= 3 threshold, pigeonhole-exact banding) must be present
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val expected = (0L until nDocs).groupBy(_ / 4).values
      .flatMap(g => for (a <- g; b <- g if a < b) yield (a, b)).toSet
    assert(expected.subsetOf(found),
      s"missing same-scene pairs: ${expected.diff(found).take(5)}")
  }

  test("dhash64 flags gradient signs: planted ramp and flat rows") {
    // row 0 strictly increasing -> all 8 bits set; row 1 flat -> 0 bits
    val pix = new Array[Byte](9 * 8)
    for (c <- 0 until 9) pix(c) = (c * 10).toByte
    for (c <- 0 until 9) pix(9 + c) = 100.toByte
    val dh = MultimodalQ.dhash64(9, pix)
    assert((dh & 0xffL) == 0xffL, "ramp row sets its 8 bits")
    assert(((dh >> 8) & 0xffL) == 0L, "flat row sets none")
  }
}
