package graft

import java.util.zip.Inflater

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MediaContainers
import graft.functions.MultimodalFunctions.MediaMeta

/** Golden tests for the pure-Scala container codec: hand-pinned REAL
  * file bytes (not round-trips of our own encoder) prove the decoder
  * reads the published layouts; round-trip properties then cover the
  * parameter space; malformed-input cases pin the downgrade-to-bin
  * contract.
  */
class MediaContainersSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // ------------------------------------------------------------------
  // golden fixtures — literal bytes of real files
  // ------------------------------------------------------------------

  test("golden PNG: the canonical 1x1 image decodes to 1x1") {
    // the widely-published smallest transparent PNG (RGBA 1x1)
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    assert(MediaContainers.decodeMeta(png) == MediaMeta("png", 1, 1, 1))
  }

  test("golden JPEG: SOI + APP0(JFIF) + COM + SOF0 marker chain") {
    // hand-assembled per ITU T.81: height 7, width 9; the COM segment
    // before SOF0 forces the walk to skip by segment length
    val jpeg = bytes(
      0xff, 0xd8, // SOI
      0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00, // APP0, len 16
      0x01, 0x02, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
      0xff, 0xfe, 0x00, 0x05, 'h', 'i', '!', // COM, len 5
      0xff, 0xc0, 0x00, 0x0b, // SOF0, len 11
      0x08, 0x00, 0x07, 0x00, 0x09, 0x01, 0x01, 0x11, 0x00,
      0xff, 0xd9) // EOI
    assert(MediaContainers.decodeMeta(jpeg) == MediaMeta("jpeg", 9, 7, 1))
  }

  test("golden JPEG: progressive SOF2 is recognized too") {
    val jpeg = bytes(
      0xff, 0xd8,
      0xff, 0xc2, 0x00, 0x0b, // SOF2 (progressive)
      0x08, 0x01, 0x00, 0x02, 0x00, 0x01, 0x01, 0x11, 0x00,
      0xff, 0xd9)
    assert(MediaContainers.decodeMeta(jpeg) == MediaMeta("jpeg", 512, 256, 1))
  }

  test("golden GIF: LSD dims + two image descriptors behind a GCE extension") {
    val gif = bytes(
      'G', 'I', 'F', '8', '9', 'a',
      0x03, 0x00, 0x02, 0x00, // 3 x 2 logical screen, little-endian
      0x00, 0x00, 0x00, // no global color table
      0x21, 0xf9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, // graphic control ext
      0x2c, 0x00, 0x00, 0x00, 0x00, 0x03, 0x00, 0x02, 0x00, 0x00, // frame 1
      0x02, 0x01, 0x44, 0x00, // lzw min + 1 sub-block + terminator
      0x2c, 0x00, 0x00, 0x00, 0x00, 0x03, 0x00, 0x02, 0x00, 0x00, // frame 2
      0x02, 0x01, 0x44, 0x00,
      0x3b) // trailer
    assert(MediaContainers.decodeMeta(gif) == MediaMeta("gif", 3, 2, 2))
  }

  test("golden GIF: global color table offset is honored") {
    // packed 0x80 | size 0 -> 2-entry GCT = 6 bytes before the frame walk
    val gif = bytes(
      'G', 'I', 'F', '8', '7', 'a',
      0x05, 0x00, 0x04, 0x00,
      0x80, 0x00, 0x00,
      0x11, 0x22, 0x33, 0x44, 0x55, 0x66, // GCT
      0x2c, 0x00, 0x00, 0x00, 0x00, 0x05, 0x00, 0x04, 0x00, 0x00,
      0x02, 0x01, 0x44, 0x00,
      0x3b)
    assert(MediaContainers.decodeMeta(gif) == MediaMeta("gif", 5, 4, 1))
  }

  test("golden WAV: 44.1kHz stereo 16-bit, 2 sample frames") {
    val wav = bytes(
      'R', 'I', 'F', 'F', 0x2c, 0x00, 0x00, 0x00, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 0x10, 0x00, 0x00, 0x00, // fmt, 16 bytes
      0x01, 0x00, // PCM
      0x02, 0x00, // 2 channels
      0x44, 0xac, 0x00, 0x00, // 44100
      0x10, 0xb1, 0x02, 0x00, // byte rate 176400
      0x04, 0x00, // block align 4
      0x10, 0x00, // 16 bits
      'd', 'a', 't', 'a', 0x08, 0x00, 0x00, 0x00, // 8 data bytes = 2 frames
      0, 0, 0, 0, 0, 0, 0, 0)
    assert(MediaContainers.decodeMeta(wav) == MediaMeta("wav", 44100, 2, 2))
  }

  test("golden WAV: LIST chunk before fmt is skipped (with odd-size padding)") {
    val wav = bytes(
      'R', 'I', 'F', 'F', 0x33, 0x00, 0x00, 0x00, 'W', 'A', 'V', 'E',
      'L', 'I', 'S', 'T', 0x03, 0x00, 0x00, 0x00, 'I', 'N', 'F', 0x00, // odd size -> pad
      'f', 'm', 't', ' ', 0x10, 0x00, 0x00, 0x00,
      0x01, 0x00, 0x01, 0x00,
      0x40, 0x1f, 0x00, 0x00, // 8000
      0x80, 0x3e, 0x00, 0x00,
      0x02, 0x00, 0x10, 0x00,
      'd', 'a', 't', 'a', 0x04, 0x00, 0x00, 0x00, 0, 0, 0, 0)
    assert(MediaContainers.decodeMeta(wav) == MediaMeta("wav", 8000, 1, 2))
  }

  // ------------------------------------------------------------------
  // encoder honesty: the synthesized containers are structurally real
  // ------------------------------------------------------------------

  test("pngBytes carries a REAL deflate IDAT that inflates to the scanline bytes") {
    val png = MediaContainers.pngBytes(5, 3)
    // walk chunks to find IDAT
    var off = 8
    var idat: Array[Byte] = null
    while (off + 8 <= png.length && idat == null) {
      val len = (((png(off) & 0xff) << 24) | ((png(off + 1) & 0xff) << 16) |
        ((png(off + 2) & 0xff) << 8) | (png(off + 3) & 0xff))
      if (new String(png, off + 4, 4, "US-ASCII") == "IDAT")
        idat = java.util.Arrays.copyOfRange(png, off + 8, off + 8 + len)
      off += 12 + len
    }
    assert(idat != null, "no IDAT chunk found")
    val inflater = new Inflater()
    inflater.setInput(idat)
    val out = new Array[Byte](3 * (5 + 1) + 16)
    val n = inflater.inflate(out)
    inflater.end()
    assert(n == 3 * (5 + 1), "IDAT must inflate to h*(w+1) filter+pixel bytes")
    assert(out.take(n).forall(_ == 0))
  }

  test("pngBytes chunk CRCs verify against an independent CRC32 pass") {
    val png = MediaContainers.pngBytes(9, 4)
    var off = 8
    var checked = 0
    while (off + 8 <= png.length) {
      val len = (((png(off) & 0xff) << 24) | ((png(off + 1) & 0xff) << 16) |
        ((png(off + 2) & 0xff) << 8) | (png(off + 3) & 0xff))
      val crc = new java.util.zip.CRC32()
      crc.update(png, off + 4, 4 + len)
      val stored = (((png(off + 8 + len) & 0xffL) << 24) |
        ((png(off + 9 + len) & 0xffL) << 16) |
        ((png(off + 10 + len) & 0xffL) << 8) | (png(off + 11 + len) & 0xffL))
      assert(crc.getValue == stored, s"CRC mismatch at chunk offset $off")
      checked += 1
      off += 12 + len
    }
    assert(checked == 3, "expected IHDR + IDAT + IEND")
  }

  // ------------------------------------------------------------------
  // round-trip properties over the parameter space
  // ------------------------------------------------------------------

  test("encode->decode round-trips across the full fixture parameter space") {
    for (i <- 0L until 400L) {
      val w = (1 + i % 64).toInt
      val h = (1 + i % 48).toInt
      assert(MediaContainers.decodeMeta(MediaContainers.pngBytes(w, h)) ==
        MediaMeta("png", w, h, 1))
      assert(MediaContainers.decodeMeta(MediaContainers.jpegBytes(w, h)) ==
        MediaMeta("jpeg", w, h, 1))
      val frames = (1 + i % 5).toInt
      assert(MediaContainers.decodeMeta(MediaContainers.gifBytes(w, h, frames)) ==
        MediaMeta("gif", w, h, frames))
      val rate = (8000 + 100 * (i % 80)).toInt
      val ch = (1 + i % 2).toInt
      val n = (1 + i % 997).toInt
      assert(MediaContainers.decodeMeta(MediaContainers.wavBytes(rate, ch, n)) ==
        MediaMeta("wav", rate, ch, n, n * 1000L / rate))
      val (mw, mh) = (16 * (1 + (i % 120)).toInt, 16 * (1 + (i % 68)).toInt)
      val ticks = 1 + i % 36000
      val tracks = (1 + i % 3).toInt
      assert(MediaContainers.decodeMeta(
        MediaContainers.mp4Bytes(mw, mh, ticks, 600, tracks)) ==
        MediaMeta("mp4", mw, mh, 0, ticks * 1000L / 600, tracks))
      val fRate = (11025 + 25 * (i % 200)).toInt
      val fCh = (1 + i % 8).toInt
      val fN = 1 + i % 44100
      assert(MediaContainers.decodeMeta(
        MediaContainers.flacBytes(fRate, fCh, fN)) ==
        MediaMeta("flac", fRate, fCh, fN.toInt, fN * 1000L / fRate))
    }
  }

  test("large dimensions survive the byte-level round trip") {
    assert(MediaContainers.decodeMeta(MediaContainers.pngBytes(4096, 2160)) ==
      MediaMeta("png", 4096, 2160, 1))
    assert(MediaContainers.decodeMeta(MediaContainers.jpegBytes(65535, 65535)) ==
      MediaMeta("jpeg", 65535, 65535, 1))
    assert(MediaContainers.decodeMeta(MediaContainers.wavBytes(192000, 8, 100000)) ==
      MediaMeta("wav", 192000, 8, 100000, 100000L * 1000 / 192000))
    assert(MediaContainers.decodeMeta(
      MediaContainers.mp4Bytes(3840, 2160, 216000L, 600, 2)) ==
      MediaMeta("mp4", 3840, 2160, 0, 360000L, 2))
  }

  // ------------------------------------------------------------------
  // MP4 / ISO-BMFF golden cases (ISO/IEC 14496-12 layouts)
  // ------------------------------------------------------------------

  private def be32b(v: Long): Seq[Int] =
    Seq((v >>> 24).toInt & 0xff, (v >>> 16).toInt & 0xff,
      (v >>> 8).toInt & 0xff, v.toInt & 0xff)

  test("golden MP4: hand-assembled v0 mvhd + two tkhd tracks") {
    // ftyp(16) + moov[ mvhd v0 (timescale 1000, duration 5000) +
    // trak[tkhd 320x240] + trak[tkhd 0x0] ]
    def box(typ: String, payload: Seq[Int]): Seq[Int] =
      be32b(payload.length + 8) ++ typ.map(_.toInt) ++ payload
    val mvhd = box("mvhd",
      be32b(0) ++ be32b(0) ++ be32b(0) ++        // v0+flags, times
        be32b(1000) ++ be32b(5000) ++            // timescale, duration
        be32b(0x00010000L) ++ Seq(1, 0) ++ Seq.fill(10)(0) ++
        Seq.fill(36)(0) ++ Seq.fill(24)(0) ++ be32b(3))
    def tkhd(w: Int, h: Int, id: Int) = box("tkhd",
      be32b(7) ++ be32b(0) ++ be32b(0) ++ be32b(id) ++ be32b(0) ++
        be32b(5000) ++ Seq.fill(8)(0) ++ Seq.fill(8)(0) ++
        Seq.fill(36)(0) ++ be32b(w.toLong << 16) ++ be32b(h.toLong << 16))
    val moov = box("moov",
      mvhd ++ box("trak", tkhd(320, 240, 1)) ++ box("trak", tkhd(0, 0, 2)))
    val file = box("ftyp", "isom".map(_.toInt) ++ be32b(0x200) ++
      "mp42".map(_.toInt)) ++ moov
    assert(MediaContainers.decodeMeta(bytes(file: _*)) ==
      MediaMeta("mp4", 320, 240, 0, 5000L, 2))
  }

  test("golden MP4: v1 mvhd (64-bit times) and 64-bit largesize moov") {
    def box(typ: String, payload: Seq[Int]): Seq[Int] =
      be32b(payload.length + 8) ++ typ.map(_.toInt) ++ payload
    // v1 mvhd: ver 1, 8-byte creation/modification, 4-byte timescale,
    // 8-byte duration
    val mvhd = box("mvhd",
      Seq(1, 0, 0, 0) ++ Seq.fill(8)(0) ++ Seq.fill(8)(0) ++
        be32b(90000) ++ be32b(0) ++ be32b(450000) ++ // timescale, duration hi/lo
        be32b(0x00010000L) ++ Seq(1, 0) ++ Seq.fill(10)(0) ++
        Seq.fill(36)(0) ++ Seq.fill(24)(0) ++ be32b(2))
    val trakPayload = box("trak", box("tkhd",
      Seq(1, 0, 0, 7) ++ Seq.fill(8)(0) ++ Seq.fill(8)(0) ++ // v1, 64-bit times
        be32b(1) ++ be32b(0) ++ Seq.fill(8)(0) ++  // id, resv, 64-bit duration
        Seq.fill(8)(0) ++                          // reserved(2×4)
        Seq.fill(8)(0) ++                          // layer, alt_group, volume, resv
        Seq.fill(36)(0) ++
        be32b(1920L << 16) ++ be32b(1080L << 16)))
    // moov with size==1: 64-bit largesize follows the fourcc
    val moovPayload = mvhd ++ trakPayload
    val moov = be32b(1) ++ "moov".map(_.toInt) ++
      be32b(0) ++ be32b(moovPayload.length + 16) ++ moovPayload
    val file = box("ftyp", "isom".map(_.toInt) ++ be32b(0) ++
      "isom".map(_.toInt)) ++ moov
    // duration 450000 @ 90000 ticks/s = 5000 ms
    assert(MediaContainers.decodeMeta(bytes(file: _*)) ==
      MediaMeta("mp4", 1920, 1080, 0, 5000L, 1))
  }

  test("truncated MP4 downgrades instead of throwing; ftyp-only has no moov") {
    val full = MediaContainers.mp4Bytes(640, 480, 1200L, 600, 1)
    for (cut <- Seq(4, 12, 20, 40, full.length - 5)) {
      val m = MediaContainers.decodeMeta(java.util.Arrays.copyOf(full, cut))
      assert(m.format == "mp4" || m.format == "bin") // never throws
    }
    // a bare ftyp box: recognized container, zero tracks, no duration
    val ftypOnly = java.util.Arrays.copyOf(full, 24)
    assert(MediaContainers.decodeMeta(ftypOnly) ==
      MediaMeta("mp4", 0, 0, 0, 0L, 0))
  }

  // ------------------------------------------------------------------
  // malformed input: downgrade, never throw
  // ------------------------------------------------------------------

  test("golden FLAC: hand-assembled 44.1kHz stereo 16-bit STREAMINFO") {
    // the canonical 0A C4 42 F0 packed word: rate 44100 (20 bits),
    // channels−1 = 1 (3 bits), bps−1 = 15 (5 bits), then 36-bit total
    // samples = 1000 (0x3E8)
    val flac =
      "fLaC".getBytes("US-ASCII") ++
        bytes(0x80, 0, 0, 34) ++ // last-flag | STREAMINFO, length 34
        bytes(0x10, 0x00, 0x10, 0x00) ++ // block size bounds 4096
        bytes(0, 0, 0, 0, 0, 0) ++ // frame size bounds unknown
        bytes(0x0a, 0xc4, 0x42, 0xf0, 0x00, 0x00, 0x03, 0xe8) ++
        new Array[Byte](16) // MD5 unknown
    assert(MediaContainers.decodeMeta(flac) ==
      MediaMeta("flac", 44100, 2, 1000, 1000L * 1000 / 44100))
  }

  test("golden FLAC: STREAMINFO behind a leading PADDING block is still found") {
    val pad = bytes(0x01, 0, 0, 4) ++ new Array[Byte](4) // PADDING, not last
    val info =
      bytes(0x80, 0, 0, 34) ++
        bytes(0x10, 0x00, 0x10, 0x00) ++ bytes(0, 0, 0, 0, 0, 0) ++
        bytes(0x0a, 0xc4, 0x42, 0xf0, 0x00, 0x00, 0x03, 0xe8) ++
        new Array[Byte](16)
    val flac = "fLaC".getBytes("US-ASCII") ++ pad ++ info
    assert(MediaContainers.decodeMeta(flac) ==
      MediaMeta("flac", 44100, 2, 1000, 22L))
    // truncated mid-STREAMINFO: downgrade, never throw
    assert(MediaContainers.decodeMeta(
      java.util.Arrays.copyOf(flac, 14)).format == "bin")
  }

  test("truncated containers downgrade to bin instead of throwing") {
    val fulls = Seq(
      MediaContainers.pngBytes(10, 10),
      MediaContainers.jpegBytes(10, 10),
      MediaContainers.wavBytes(8000, 1, 10))
    for (full <- fulls; cut <- Seq(4, 10, 14)) {
      if (cut < full.length) {
        val t = java.util.Arrays.copyOf(full, cut)
        val m = MediaContainers.decodeMeta(t)
        // a cut inside the magic -> bin; a cut after the header may still
        // decode — either way, no exception escapes
        assert(m.format == "bin" || m.width >= 0)
      }
    }
    // gif cut mid-LSD is shorter than the 13-byte minimum -> bin
    assert(MediaContainers.decodeMeta(
      java.util.Arrays.copyOf(MediaContainers.gifBytes(3, 3, 1), 9)) ==
      MediaMeta("bin", 0, 0, 0, 0L, 0))
  }

  test("JPEG with EOI before any SOF is malformed -> bin") {
    assert(MediaContainers.decodeMeta(bytes(0xff, 0xd8, 0xff, 0xd9)) ==
      MediaMeta("bin", 0, 0, 0, 0L, 0))
  }

  test("random garbage never throws") {
    val rng = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val b = new Array[Byte](rng.nextInt(64))
      rng.nextBytes(b)
      MediaContainers.decodeMeta(b) // must not throw
    }
  }

  test("golden PCM WAV: hand-pinned bytes decode to the signed samples") {
    // 8kHz mono, samples {1, -1, -32768}: data = 01 00 FF FF 00 80
    val b = bytes('R', 'I', 'F', 'F', 42, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0, 1, 0, 1, 0,
      0x40, 0x1f, 0, 0, // 8000
      0x80, 0x3e, 0, 0, // byte rate 16000
      2, 0, 16, 0,
      'd', 'a', 't', 'a', 6, 0, 0, 0,
      0x01, 0x00, 0xff, 0xff, 0x00, 0x80)
    val (rate, smp) = MediaContainers.wavPcmSamples(b)
    assert(rate == 8000)
    assert(smp.toSeq == Seq[Short](1, -1, -32768))
  }

  test("wavBytesPcm round-trips the full signed range and keeps decodeMeta coherent") {
    val samples = Array[Short](0, 1, -1, 1000, -1000, 32767, -32768, 255, -256)
    val b = MediaContainers.wavBytesPcm(44100, samples)
    val (rate, back) = MediaContainers.wavPcmSamples(b)
    assert(rate == 44100 && back.toSeq == samples.toSeq)
    val meta = MediaContainers.decodeMeta(b)
    assert(meta.format == "wav" && meta.width == 44100 &&
      meta.n_frames == samples.length)
  }

  test("PCM decode downgrades, never throws: truncated data, stereo, 8-bit") {
    val ok = MediaContainers.wavBytesPcm(8000, Array[Short](5, -5))
    // data chunk length points past EOF -> no samples
    assert(MediaContainers.wavPcmSamples(
      java.util.Arrays.copyOf(ok, ok.length - 1))._2.isEmpty)
    // stereo and non-16-bit files are not this decoder's contract
    assert(MediaContainers.wavPcmSamples(
      MediaContainers.wavBytes(8000, 2, 4))._2.isEmpty)
    assert(MediaContainers.wavPcmSamples(bytes(1, 2, 3))._2.isEmpty)
  }
}
