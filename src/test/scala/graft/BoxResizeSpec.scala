package graft

import graft.functions.{MediaContainers, MultimodalFunctions}

/** Kernel ground truth for the real gray resize
  * (MultimodalFunctions.boxResizeGray) and its codec round trip.
  */
class BoxResizeSpec extends SparkSpecBase {

  test("box filter: hand-computed floor averages on a planted 4x4 -> 2x2") {
    // blocks: [10,20;30,40] avg 25; [100,101;102,104] floor 101;
    // [255,255;255,255] = 255; [0,1;2,2] floor 1
    val pix = Array[Int](
      10, 20, 100, 101,
      30, 40, 102, 104,
      255, 255, 0, 1,
      255, 255, 2, 2).map(_.toByte)
    val (ow, oh, out) = MultimodalFunctions.boxResizeGray(4, 4, pix, 2, 2)
    assert((ow, oh) == (2, 2))
    assert(out.map(_ & 0xff).toSeq == Seq(25, 101, 255, 1))
  }

  test("floor semantics: a block summing to a non-multiple of the area truncates") {
    val pix = Array[Int](1, 1, 1, 2).map(_.toByte) // sum 5, area 4 -> 1
    val (_, _, out) = MultimodalFunctions.boxResizeGray(2, 2, pix, 2, 2)
    assert(out.map(_ & 0xff).toSeq == Seq(1))
  }

  test("non-exact shrink factors are rejected") {
    intercept[IllegalArgumentException] {
      MultimodalFunctions.boxResizeGray(5, 4, new Array[Byte](20), 2, 2)
    }
  }

  test("resized image survives the PNG round trip bit-for-bit") {
    val src = Array.tabulate(32 * 24)(i => ((i * 37 + 11) % 251).toByte)
    val (ow, oh, small) = MultimodalFunctions.boxResizeGray(32, 24, src, 4, 4)
    val (w2, h2, back) =
      MediaContainers.pngGrayPixels(MediaContainers.pngBytesGray(ow, oh, small))
    assert((w2, h2) == (8, 6))
    assert(back.toSeq == small.toSeq)
  }
}
