package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.Ppm
import graft.multimodal.Jpeg

/** Baseline JFIF codec (r7 verdict item 2). The golden tests compute
  * expected pixels with an INDEPENDENT direct double-sum IDCT (the
  * decoder is separable) and the JFIF color formula re-derived
  * inline, so agreement proves the marker walk, Huffman tables,
  * run-length/ZRL/EOB handling, dequantization, IDCT, restart
  * markers, 4:2:0 upsampling, and YCbCr→RGB — not just
  * self-consistency.
  */
class JpegSpec extends SparkSpec {

  /** Independent reference: direct O(64²) 2-D IDCT of one block of
    * ALREADY-QUANTIZED coefficients (natural order) under quant table
    * `q`, with the codec's pinned floor(x+0.5) rounding.
    */
  private def refIdct(coefQ: Array[Int], q: Array[Int]): Array[Int] = {
    def cc(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    Array.tabulate(64) { i =>
      val x = i % 8; val y = i / 8
      var s = 0.0
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          s += 0.25 * cc(u) * cc(v) * coefQ(v * 8 + u) * q(v * 8 + u) *
            math.cos((2 * x + 1) * u * math.Pi / 16.0) *
            math.cos((2 * y + 1) * v * math.Pi / 16.0)
          u += 1
        }
        v += 1
      }
      val p = math.floor(s + 128.0 + 0.5).toInt
      math.max(0, math.min(255, p))
    }
  }

  test("gray-block 4:2:0 file round-trips pixel-exact (incl. restarts)") {
    val grays = Array.tabulate(72)(k => (k * 37 + 11) % 256)
    val bytes = Jpeg.encodeGrayBlocks(9, 8, grays)
    // restart markers are actually present (one per MCU row)
    val hasRst = bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    assert(hasRst, "encoder must emit RSTn at MCU-row boundaries")
    assert(Jpeg.hasSignature(bytes))
    val img = Jpeg.decode(bytes).getOrElse(fail("decode returned None"))
    assert(img.width == 72 && img.height == 64)
    for (r <- 0 until 64; c <- 0 until 72) {
      val want = grays((r / 8) * 9 + c / 8)
      val o = 3 * (r * 72 + c)
      val (pr, pg, pb) = (img.pixels(o) & 0xff, img.pixels(o + 1) & 0xff,
        img.pixels(o + 2) & 0xff)
      assert(pr == want && pg == want && pb == want,
        s"pixel ($r,$c): got ($pr,$pg,$pb), want gray $want")
    }
    // nearest-neighbor resample back to the 9x8 grid IS the formula
    val small = Ppm.resample(img, 9, 8)
    for (k <- 0 until 72)
      assert((small.pixels(3 * k) & 0xff) == grays(k))
  }

  test("AC coefficients, long zero runs, and ZRL decode to the reference IDCT") {
    val q = Array.fill(64)(4); q(0) = 8
    def blk(entries: (Int, Int)*): Array[Int] = {
      val b = new Array[Int](64)
      entries.foreach { case (zig, v) => b(Jpeg.Zigzag(zig)) = v }
      b
    }
    val blocks = Array(
      blk(0 -> 3, 1 -> 5, 2 -> -2, 5 -> 7),     // low-frequency ACs
      blk(0 -> -4, 1 -> 2, 18 -> -3, 63 -> 1),  // gap > 15 → ZRL path
      blk(0 -> 0),                              // all-zero block (EOB only)
      blk(0 -> 120, 35 -> -6))                  // large DC diff category
    val bytes = Jpeg.encodeCoeffGray(2, 2, blocks, q)
    val img = Jpeg.decode(bytes).getOrElse(fail("decode returned None"))
    assert(img.width == 16 && img.height == 16)
    for (bi <- 0 until 4) {
      val want = refIdct(blocks(bi), q)
      val (br, bc) = (bi / 2, bi % 2)
      for (y <- 0 until 8; x <- 0 until 8) {
        val o = 3 * ((8 * br + y) * 16 + 8 * bc + x)
        assert((img.pixels(o) & 0xff) == want(y * 8 + x),
          s"block $bi pixel ($y,$x)")
      }
    }
  }

  test("4:4:4 color: chroma DCs drive the JFIF conversion exactly") {
    val qL = Array.fill(64)(1); val qC = Array.fill(64)(1)
    // constant blocks via DC-only quantized coefficients: value =
    // DC/8 + 128 (orthonormal DCT of a constant)
    def const(v: Int) = { val b = new Array[Int](64); b(0) = 8 * (v - 128); b }
    val bytes = Jpeg.encodeCoeff444(1, 1,
      Array(const(100)), Array(const(160)), Array(const(90)), qL, qC)
    val img = Jpeg.decode(bytes).getOrElse(fail("decode returned None"))
    assert(img.width == 8 && img.height == 8)
    def cvt(yv: Int, cb: Int, cr: Int): (Int, Int, Int) = {
      def f(x: Double) = math.max(0, math.min(255,
        math.floor(x + 0.5).toInt))
      (f(yv + 1.402 * (cr - 128)),
        f(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        f(yv + 1.772 * (cb - 128)))
    }
    val (er, eg, eb) = cvt(100, 160, 90)
    for (i <- 0 until 64) {
      val o = 3 * i
      assert((img.pixels(o) & 0xff) == er &&
        (img.pixels(o + 1) & 0xff) == eg &&
        (img.pixels(o + 2) & 0xff) == eb,
        s"pixel $i: (${img.pixels(o) & 0xff},${img.pixels(o + 1) & 0xff}," +
          s"${img.pixels(o + 2) & 0xff}) want ($er,$eg,$eb)")
    }
  }

  test("out-of-scope and malformed inputs return None, not garbage") {
    val good = Jpeg.encodeGrayBlocks(2, 2, Array.fill(4)(77))
    // progressive: flip SOF0 -> SOF2
    val prog = good.clone()
    val sofAt = prog.indices.find(i => (prog(i) & 0xff) == 0xff &&
      (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog).isEmpty, "SOF2 must be out of scope")
    // truncated entropy data
    assert(Jpeg.decode(good.take(good.length - 6)).isEmpty)
    // 4:2:2 sampling (Y 2x1) is out of scope
    val s422 = good.clone()
    // FF C0 len len 8 hh hh ww ww nc | id hv tq | ... → hv at +11
    s422(sofAt + 11) = 0x21.toByte
    assert(Jpeg.decode(s422).isEmpty, "4:2:2 must be out of scope")
    // not a JPEG at all
    assert(!Jpeg.hasSignature("P6 1 1 255 xxx".getBytes))
    assert(Jpeg.decode(Array.fill[Byte](32)(0x41)).isEmpty)
  }

  test("decodeImage seam sniffs JPEG alongside PNG and PPM") {
    val grays = Array.tabulate(4)(k => 40 * k + 20)
    val jp = Jpeg.encodeGrayBlocks(2, 2, grays)
    val viaSeam = Multimodal.decodeImage(jp)
      .getOrElse(fail("seam did not decode the JPEG"))
    assert(viaSeam.width == 16 && viaSeam.height == 16)
    assert((viaSeam.pixels(0) & 0xff) == grays(0))
    // PPM still routes through the PPM branch
    val ppm = Ppm.encode(Ppm.Image(1, 1, Array[Byte](1, 2, 3)))
    assert(Multimodal.decodeImage(ppm).exists(_.width == 1))
  }
}
