package graft.multimodal

import graft.multimodal.Multimodal.Ppm

/** REAL compressed image codec #2: baseline JFIF (JPEG) — r7 verdict
  * item 2: "a crawler's image bytes are overwhelmingly JPEG", so the
  * perceptual near-dup path must see real pixels for the dominant
  * format, not the deterministic fallback.
  *
  * Decode scope (the [[Png]] discipline — most-common web shape only,
  * `None` on everything else): baseline sequential DCT (SOF0), 8-bit
  * precision, Huffman entropy coding, single interleaved scan;
  * 1-component grayscale, or 3-component YCbCr at 4:4:4 (all 1×1
  * sampling) or 4:2:0 (Y 2×2, chroma 1×1); 8-bit quantization
  * tables; restart intervals (DRI + RSTn) supported. Everything else
  * — progressive (SOF2), arithmetic coding, 12-bit precision, 4:2:2,
  * multi-scan, 16-bit quant tables — returns None and takes the
  * catalog's documented deterministic fallback.
  *
  * Pixel-exactness contract (what lets the q117 oracle apply verbatim
  * to JPEG payloads): for DC-only blocks the round trip is EXACT —
  * a constant 8×8 block value v encodes as S(0,0) = 8·(v−128)
  * (orthonormal 2-D DCT of a constant), which any divisor-of-8 DC
  * quantizer carries losslessly, and the IDCT of a lone DC is the
  * constant S(0,0)/8 + 128 = v again (float noise ~1e-13 « the 0.5
  * rounding margin). [[encodeGrayBlocks]] generates exactly that
  * class: gray (Cb=Cr=128) block-mosaic images, so
  * decode(encode(blocks)) reproduces the generative formula
  * bit-for-bit and a dHash match through the DuckDB oracle isolates
  * the full JFIF marker-walk → Huffman → dequant → IDCT → upsample →
  * YCbCr→RGB path. General AC paths are exercised by JpegSpec's
  * hand-authored coefficient fixtures against an independent direct
  * double-sum IDCT.
  *
  * Deterministic rounding pins (cross-run portability): IDCT output
  * sample = clamp(floor(x + 0.5)) with x the double-precision
  * separable IDCT; YCbCr→RGB uses the JFIF constants (1.402,
  * 0.344136, 0.714136, 1.772) with the same floor(x+0.5) rounding;
  * 4:2:0 chroma upsampling is sample replication (x/2, y/2).
  */
object Jpeg {

  // zigzag scan position k -> natural (row-major) coefficient index
  private[graft] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // ITU T.81 Annex K quantization tables (natural order), DC slot
  // overridden to 8: any divisor of 8 carries the constant-block DC
  // 8*(v-128) losslessly (see the exactness contract above). AC slots
  // only matter for spec fixtures; the K.1/K.2 values keep the DQT
  // segment shaped like a real encoder's.
  private[multimodal] val QLuma: Array[Int] = {
    val t = Array(
      16, 11, 10, 16, 24, 40, 51, 61,
      12, 12, 14, 19, 26, 58, 60, 55,
      14, 13, 16, 24, 40, 57, 69, 56,
      14, 17, 22, 29, 51, 87, 80, 62,
      18, 22, 37, 56, 68, 109, 103, 77,
      24, 35, 55, 64, 81, 104, 113, 92,
      49, 64, 78, 87, 103, 121, 120, 101,
      72, 92, 95, 98, 112, 100, 103, 99)
    t(0) = 8; t
  }
  private[multimodal] val QChroma: Array[Int] = {
    val t = Array(
      17, 18, 24, 47, 99, 99, 99, 99,
      18, 21, 26, 66, 99, 99, 99, 99,
      24, 26, 56, 99, 99, 99, 99, 99,
      47, 66, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99)
    t(0) = 8; t
  }

  // T.81 Annex K Huffman tables: (BITS counts per code length 1..16,
  // symbol values). The decoder reads tables from DHT — these only
  // shape what the ENCODER emits (and the DHT segments carry them
  // explicitly, so the files are self-contained standard JFIF).
  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray
  private val AcLumaBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** First three bytes of every JFIF/EXIF JPEG: SOI then a marker. */
  def hasSignature(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 3 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff

  // ---- canonical Huffman (T.81 C.2 / F.2.2.3) ----------------------

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // mincode/maxcode/valptr per code length 1..16
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    /** Symbol-to-(code, length) map for the encoder side. */
    lazy val encodeMap: Map[Int, (Int, Int)] = {
      var code = 0
      var k = 0
      val m = Map.newBuilder[Int, (Int, Int)]
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          m += (vals(k) -> (code, l))
          code += 1; k += 1; i += 1
        }
        code <<= 1
        l += 1
      }
      m.result()
    }
  }

  // ---- decoder ------------------------------------------------------

  /** Entropy-coded-segment bit reader with 0xFF00 unstuffing. A bare
    * marker (0xFF xx, xx != 0) ends the readable stream; RSTn markers
    * are consumed explicitly at restart boundaries via [[restart]].
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var bad = false
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) { bad = true; return 0 }
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) { bad = true; return 0 }
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1
          else { bad = true; return 0 } // marker inside coded data
          v = 0xff
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTn marker. */
    def restart(n: Int): Boolean = {
      nbits = 0
      if (pos + 1 >= b.length) return false
      if ((b(pos) & 0xff) != 0xff ||
        (b(pos + 1) & 0xff) != (0xd0 + (n % 8))) return false
      pos += 2
      true
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def huffDecode(br: BitReader, t: HuffTable): Int = {
    var l = 1
    var code = br.bit()
    while (l <= 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
      code = (code << 1) | br.bit()
      l += 1
    }
    if (l > 16 || br.bad) { br.bad = true; 0 }
    else t.values(t.valPtr(l) + code - t.minCode(l))
  }

  // separable double-precision IDCT; cs(u)(x) = C(u) cos((2x+1)uπ/16)/2
  private val CosTbl: Array[Array[Double]] = Array.tabulate(8, 8) {
    (u, x) =>
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: tmp(y,x) = sum_u coef(y,u) cs(u,x)
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(y * 8 + u) * CosTbl(u)(x); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // cols: out(y,x) = sum_v tmp(v,x) cs(v,y)
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += tmp(v * 8 + x) * CosTbl(v)(yy); v += 1 }
        val px = math.floor(s + 128.0 + 0.5).toInt
        out(yy * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        yy += 1
      }
      x += 1
    }
  }

  private def clampByte(x: Double): Int = {
    val v = math.floor(x + 0.5).toInt
    if (v < 0) 0 else if (v > 255) 255 else v
  }

  /** Parse + Huffman-decode + dequantize + IDCT + upsample + color
    * convert. None on anything outside the documented baseline scope
    * — including truncated entropy data and bad marker structure.
    */
  def decode(bytes: Array[Byte]): Option[Ppm.Image] = {
    if (!hasSignature(bytes)) return None
    val qt = new Array[Array[Int]](4) // natural order
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var w = 0; var h = 0
    var nc = 0
    var compH: Array[Int] = null; var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var compDc: Array[Int] = null; var compAc: Array[Int] = null
    var compId: Array[Int] = null
    var restartInterval = 0
    var sawSof = false
    var i = 2
    def u16(at: Int): Int = ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)

    var scanDone = false
    var planes: Array[Array[Int]] = null
    var planeW: Array[Int] = null; var planeH: Array[Int] = null

    while (!scanDone) {
      // marker: skip fill bytes
      if (i + 1 >= bytes.length) return None
      if ((bytes(i) & 0xff) != 0xff) return None
      var m = bytes(i + 1) & 0xff
      i += 2
      while (m == 0xff && i < bytes.length) { m = bytes(i) & 0xff; i += 1 }
      if (m == 0xd9) return None // EOI before any scan
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) return None
      if (i + 1 >= bytes.length) return None
      val len = u16(i)
      if (len < 2 || i + len > bytes.length) return None
      val segEnd = i + len
      m match {
        case 0xdb => // DQT
          var p = i + 2
          while (p < segEnd) {
            val pq = (bytes(p) & 0xf0) >> 4
            val tq = bytes(p) & 0x0f
            if (pq != 0 || tq > 3 || p + 65 > segEnd) return None
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(Zigzag(k)) = bytes(p + 1 + k) & 0xff; k += 1 }
            qt(tq) = t
            p += 65
          }
        case 0xc4 => // DHT
          var p = i + 2
          while (p < segEnd) {
            val tc = (bytes(p) & 0xf0) >> 4
            val th = bytes(p) & 0x0f
            if (tc > 1 || th > 3 || p + 17 > segEnd) return None
            val bits = Array.tabulate(16)(k => bytes(p + 1 + k) & 0xff)
            val n = bits.sum
            if (p + 17 + n > segEnd || n > 256) return None
            val vals = Array.tabulate(n)(k => bytes(p + 17 + k) & 0xff)
            val tbl = new HuffTable(bits, vals)
            if (tc == 0) dcT(th) = tbl else acT(th) = tbl
            p += 17 + n
          }
        case 0xc0 => // SOF0 baseline
          if (sawSof || len < 8) return None
          sawSof = true
          if ((bytes(i + 2) & 0xff) != 8) return None
          h = u16(i + 3); w = u16(i + 5)
          nc = bytes(i + 7) & 0xff
          if (w <= 0 || h <= 0 || (nc != 1 && nc != 3) ||
            len != 8 + 3 * nc) return None
          compId = new Array[Int](nc)
          compH = new Array[Int](nc); compV = new Array[Int](nc)
          compQ = new Array[Int](nc)
          var c = 0
          while (c < nc) {
            compId(c) = bytes(i + 8 + 3 * c) & 0xff
            val hv = bytes(i + 9 + 3 * c) & 0xff
            compH(c) = (hv >> 4) & 0xf; compV(c) = hv & 0xf
            compQ(c) = bytes(i + 10 + 3 * c) & 0xff
            if (compQ(c) > 3) return None
            c += 1
          }
          val ok =
            if (nc == 1) compH(0) == 1 && compV(0) == 1
            else (compH.sameElements(Array(1, 1, 1)) &&
              compV.sameElements(Array(1, 1, 1))) || // 4:4:4
              (compH.sameElements(Array(2, 1, 1)) &&
                compV.sameElements(Array(2, 1, 1))) // 4:2:0
          if (!ok) return None
        case x if (x >= 0xc1 && x <= 0xcf) && x != 0xc4 && x != 0xc8 =>
          return None // progressive/extended/arithmetic/lossless
        case 0xdd => // DRI
          if (len != 4) return None
          restartInterval = u16(i + 2)
        case 0xda => // SOS — single interleaved baseline scan
          if (!sawSof) return None
          val ns = bytes(i + 2) & 0xff
          if (ns != nc || len != 6 + 2 * ns) return None
          compDc = new Array[Int](nc); compAc = new Array[Int](nc)
          var c = 0
          while (c < ns) {
            val cs = bytes(i + 3 + 2 * c) & 0xff
            val idx = compId.indexOf(cs)
            if (idx != c) return None // component order must match SOF
            val tdta = bytes(i + 4 + 2 * c) & 0xff
            compDc(c) = (tdta >> 4) & 0xf; compAc(c) = tdta & 0xf
            if (compDc(c) > 3 || compAc(c) > 3) return None
            c += 1
          }
          if ((bytes(i + 3 + 2 * ns) & 0xff) != 0 ||
            (bytes(i + 4 + 2 * ns) & 0xff) != 63 ||
            (bytes(i + 5 + 2 * ns) & 0xff) != 0) return None
          c = 0
          while (c < nc) {
            if (qt(compQ(c)) == null || dcT(compDc(c)) == null ||
              acT(compAc(c)) == null) return None
            c += 1
          }
          // decode the entropy-coded segment
          val hMax = compH.max; val vMax = compV.max
          val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
          val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
          planeW = Array.tabulate(nc)(c0 => mcusX * 8 * compH(c0))
          planeH = Array.tabulate(nc)(c0 => mcusY * 8 * compV(c0))
          planes = Array.tabulate(nc)(c0 =>
            new Array[Int](planeW(c0) * planeH(c0)))
          val br = new BitReader(bytes, segEnd)
          val pred = new Array[Int](nc)
          val coef = new Array[Int](64)
          val blk = new Array[Int](64)
          var mcu = 0
          val nMcus = mcusX * mcusY
          var rstCount = 0
          while (mcu < nMcus) {
            if (restartInterval > 0 && mcu > 0 &&
              mcu % restartInterval == 0) {
              if (!br.restart(rstCount)) return None
              rstCount += 1
              java.util.Arrays.fill(pred, 0)
            }
            val my = mcu / mcusX; val mx = mcu % mcusX
            var c0 = 0
            while (c0 < nc) {
              val q = qt(compQ(c0))
              var by = 0
              while (by < compV(c0)) {
                var bx = 0
                while (bx < compH(c0)) {
                  java.util.Arrays.fill(coef, 0)
                  // DC
                  val s = huffDecode(br, dcT(compDc(c0)))
                  if (s > 11 || br.bad) return None
                  val diff = extend(br.receive(s), s)
                  pred(c0) += diff
                  coef(0) = pred(c0) * q(0)
                  // AC
                  var k = 1
                  var eob = false
                  while (k < 64 && !eob) {
                    val rs = huffDecode(br, acT(compAc(c0)))
                    if (br.bad) return None
                    val r = (rs >> 4) & 0xf; val sz = rs & 0xf
                    if (sz == 0) {
                      if (r == 15) k += 16 else eob = true
                    } else {
                      k += r
                      if (k > 63) return None
                      val nat = Zigzag(k)
                      coef(nat) = extend(br.receive(sz), sz) * q(nat)
                      k += 1
                    }
                  }
                  if (br.bad) return None
                  idct(coef, blk)
                  // place block into the component plane
                  val px0 = (my * compV(c0) + by) * 8
                  val py0 = (mx * compH(c0) + bx) * 8
                  val pw = planeW(c0)
                  var yy = 0
                  while (yy < 8) {
                    var xx = 0
                    while (xx < 8) {
                      planes(c0)((px0 + yy) * pw + py0 + xx) =
                        blk(yy * 8 + xx)
                      xx += 1
                    }
                    yy += 1
                  }
                  bx += 1
                }
                by += 1
              }
              c0 += 1
            }
            mcu += 1
          }
          scanDone = true
          i = br.pos
        case x if (x >= 0xe0 && x <= 0xef) || x == 0xfe => () // APPn/COM
        case _ => return None
      }
      if (!scanDone) i = segEnd
    }
    // expect EOI (fill bytes tolerated)
    if (i + 1 >= bytes.length || (bytes(i) & 0xff) != 0xff) return None
    var m2 = bytes(i + 1) & 0xff
    i += 2
    while (m2 == 0xff && i < bytes.length) { m2 = bytes(i) & 0xff; i += 1 }
    if (m2 != 0xd9) return None

    // upsample + color convert into RGB
    val px = new Array[Byte](3 * w * h)
    val hMax = compH.max; val vMax = compV.max
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val d = 3 * (y * w + x)
        if (nc == 1) {
          val v = planes(0)(y * planeW(0) + x)
          px(d) = v.toByte; px(d + 1) = v.toByte; px(d + 2) = v.toByte
        } else {
          val yv = planes(0)(y * planeW(0) + x).toDouble
          // chroma sample position under the component's sampling
          val cx1 = x * compH(1) / hMax; val cy1 = y * compV(1) / vMax
          val cb = planes(1)(cy1 * planeW(1) + cx1).toDouble - 128.0
          val cx2 = x * compH(2) / hMax; val cy2 = y * compV(2) / vMax
          val cr = planes(2)(cy2 * planeW(2) + cx2).toDouble - 128.0
          px(d) = clampByte(yv + 1.402 * cr).toByte
          px(d + 1) = clampByte(yv - 0.344136 * cb - 0.714136 * cr).toByte
          px(d + 2) = clampByte(yv + 1.772 * cb).toByte
        }
        x += 1
      }
      y += 1
    }
    Some(Ppm.Image(w, h, px))
  }

  // ---- encoder (fixture generator) -----------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var l = len - 1
      while (l >= 0) {
        acc = (acc << 1) | ((code >> l) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        l -= 1
      }
    }
    /** Pad the current byte with 1-bits (T.81 F.1.2.3). */
    def align(): Unit = if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
  }

  private def magnitudeCat(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode one quantized-coefficient block (natural order) into the
    * scan: DC diff + AC run-lengths + EOB. Package-private so
    * JpegSpec can author fixtures with arbitrary AC structure.
    */
  private def writeBlock(bw: BitWriter, coefQ: Array[Int], pred: Int,
                         dc: HuffTable, ac: HuffTable): Int = {
    val diff = coefQ(0) - pred
    val s = magnitudeCat(diff)
    val (c, l) = dc.encodeMap(s)
    bw.put(c, l)
    if (s > 0)
      bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    // AC in zigzag order
    var run = 0
    var k = 1
    while (k < 64) {
      val v = coefQ(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run > 15) { val (zc, zl) = ac.encodeMap(0xf0); bw.put(zc, zl); run -= 16 }
        val sz = magnitudeCat(v)
        val (hc, hl) = ac.encodeMap((run << 4) | sz)
        bw.put(hc, hl)
        bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, el) = ac.encodeMap(0x00); bw.put(ec, el) }
    coefQ(0)
  }

  private def seg(out: java.io.ByteArrayOutputStream, marker: Int,
                  payload: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = payload.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(payload, 0, payload.length)
  }

  private def dqtSeg(tq: Int, tblNatural: Array[Int]): Array[Byte] = {
    val b = new Array[Byte](65)
    b(0) = tq.toByte
    var k = 0
    while (k < 64) { b(1 + k) = tblNatural(Zigzag(k)).toByte; k += 1 }
    b
  }

  private def dhtSeg(tc: Int, th: Int, bits: Array[Int],
                     vals: Array[Int]): Array[Byte] = {
    val b = new Array[Byte](17 + vals.length)
    b(0) = ((tc << 4) | th).toByte
    var k = 0
    while (k < 16) { b(1 + k) = bits(k).toByte; k += 1 }
    k = 0
    while (k < vals.length) { b(17 + k) = vals(k).toByte; k += 1 }
    b
  }

  /** Generate a baseline 4:2:0 YCbCr JFIF file from a gridW×gridH
    * mosaic of constant 8×8 gray blocks (`grays(r*gridW+c)` ∈
    * [0,255]) — the exact-round-trip image class (scaladoc above).
    * Emits a restart interval of one MCU row, so RSTn handling sits
    * on the oracle-checked path. Output dims: (8·gridW) × (8·gridH).
    */
  def encodeGrayBlocks(gridW: Int, gridH: Int,
                       grays: Array[Int]): Array[Byte] = {
    require(gridW > 0 && gridH > 0 && grays.length == gridW * gridH,
      s"grid ${gridW}x$gridH needs ${gridW * gridH} values")
    val w = 8 * gridW; val h = 8 * gridH
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // APP0 JFIF v1.01, no thumbnail
    seg(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0,
      0, 1, 0, 1, 0, 0))
    seg(out, 0xdb, dqtSeg(0, QLuma))
    seg(out, 0xdb, dqtSeg(1, QChroma))
    // SOF0: 8-bit, 3 components, Y 2x2 + Cb/Cr 1x1 (4:2:0)
    seg(out, 0xc0, Array[Byte](8,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(out, 0xc4, dhtSeg(0, 0, DcLumaBits, DcLumaVals))
    seg(out, 0xc4, dhtSeg(1, 0, AcLumaBits, AcLumaVals))
    seg(out, 0xc4, dhtSeg(0, 1, DcChromaBits, DcChromaVals))
    seg(out, 0xc4, dhtSeg(1, 1, AcLumaBits, AcLumaVals))
    val mcusX = (gridW + 1) / 2; val mcusY = (gridH + 1) / 2
    // DRI: restart every MCU row
    seg(out, 0xdd, Array[Byte](((mcusX >> 8) & 0xff).toByte,
      (mcusX & 0xff).toByte))
    // SOS
    seg(out, 0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val dcL = new HuffTable(DcLumaBits, DcLumaVals)
    val acL = new HuffTable(AcLumaBits, AcLumaVals)
    val dcC = new HuffTable(DcChromaBits, DcChromaVals)
    val bw = new BitWriter(out)
    val coefQ = new Array[Int](64)
    var predY = 0; var predCb = 0; var predCr = 0
    var rst = 0
    var my = 0
    while (my < mcusY) {
      if (my > 0) { // restart at each MCU row boundary
        bw.align()
        out.write(0xff); out.write(0xd0 + (rst % 8))
        rst += 1
        predY = 0; predCb = 0; predCr = 0
      }
      var mx = 0
      while (mx < mcusX) {
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            // edge-replicated padding keeps pad blocks constant too
            val r = math.min(2 * my + by, gridH - 1)
            val c = math.min(2 * mx + bx, gridW - 1)
            java.util.Arrays.fill(coefQ, 0)
            // constant block v: S(0,0) = 8*(v-128); QLuma(0)=8 → exact
            coefQ(0) = grays(r * gridW + c) - 128
            predY = writeBlock(bw, coefQ, predY, dcL, acL)
            bx += 1
          }
          by += 1
        }
        java.util.Arrays.fill(coefQ, 0) // Cb = 128 → DC 0
        predCb = writeBlock(bw, coefQ, predCb, dcC, acL)
        java.util.Arrays.fill(coefQ, 0) // Cr = 128 → DC 0
        predCr = writeBlock(bw, coefQ, predCr, dcC, acL)
        mx += 1
      }
      my += 1
    }
    bw.align()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Spec-facing fixture author: a single-table grayscale baseline
    * JPEG from ALREADY-QUANTIZED coefficient blocks in natural order
    * (one per 8×8 tile, row-major) — lets JpegSpec exercise the AC
    * run-length/ZRL/EOB and IDCT paths with known coefficients and an
    * independently computed expected image. 4:4:4 single-component.
    */
  private[graft] def encodeCoeffGray(
      gridW: Int, gridH: Int, blocks: Array[Array[Int]],
      qNatural: Array[Int]): Array[Byte] = {
    require(blocks.length == gridW * gridH)
    val w = 8 * gridW; val h = 8 * gridH
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    seg(out, 0xdb, dqtSeg(0, qNatural))
    seg(out, 0xc0, Array[Byte](8,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte, 1, 1, 0x11, 0))
    seg(out, 0xc4, dhtSeg(0, 0, DcLumaBits, DcLumaVals))
    seg(out, 0xc4, dhtSeg(1, 0, AcLumaBits, AcLumaVals))
    seg(out, 0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    val dcL = new HuffTable(DcLumaBits, DcLumaVals)
    val acL = new HuffTable(AcLumaBits, AcLumaVals)
    val bw = new BitWriter(out)
    var pred = 0
    blocks.foreach { b => pred = writeBlock(bw, b, pred, dcL, acL) }
    bw.align()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  /** Spec-facing 3-component 4:4:4 fixture author (same contract as
    * [[encodeCoeffGray]], one quantized block per component per
    * tile) — exercises the decoder's 4:4:4 layout and the YCbCr→RGB
    * conversion with chroma ≠ 128.
    */
  private[graft] def encodeCoeff444(
      gridW: Int, gridH: Int, yB: Array[Array[Int]],
      cbB: Array[Array[Int]], crB: Array[Array[Int]],
      qLuma: Array[Int], qChroma: Array[Int]): Array[Byte] = {
    require(yB.length == gridW * gridH &&
      cbB.length == yB.length && crB.length == yB.length)
    val w = 8 * gridW; val h = 8 * gridH
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    seg(out, 0xdb, dqtSeg(0, qLuma))
    seg(out, 0xdb, dqtSeg(1, qChroma))
    seg(out, 0xc0, Array[Byte](8,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte, 3,
      1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(out, 0xc4, dhtSeg(0, 0, DcLumaBits, DcLumaVals))
    seg(out, 0xc4, dhtSeg(1, 0, AcLumaBits, AcLumaVals))
    seg(out, 0xc4, dhtSeg(0, 1, DcChromaBits, DcChromaVals))
    seg(out, 0xc4, dhtSeg(1, 1, AcLumaBits, AcLumaVals))
    seg(out, 0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val dcL = new HuffTable(DcLumaBits, DcLumaVals)
    val acL = new HuffTable(AcLumaBits, AcLumaVals)
    val dcC = new HuffTable(DcChromaBits, DcChromaVals)
    val bw = new BitWriter(out)
    var pY = 0; var pCb = 0; var pCr = 0
    var i = 0
    while (i < yB.length) {
      pY = writeBlock(bw, yB(i), pY, dcL, acL)
      pCb = writeBlock(bw, cbB(i), pCb, dcC, acL)
      pCr = writeBlock(bw, crB(i), pCr, dcC, acL)
      i += 1
    }
    bw.align()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }
}
