package graft.multimodal

/** Clean-room BASELINE JPEG codec (ITU-T T.81 sequential DCT, SOF0):
  * grayscale and YCbCr 4:2:0 encode, 1/3-component decode. Written
  * from the public spec; the Huffman and quantization tables in the
  * `Std*` constants are the example tables PRINTED IN the spec
  * (T.81 Annex K) — spec data, not code. Mirrors the reference
  * pipeline's image-ingest role (reference: src/extractors read
  * opaque media blobs; this repo decodes them engine-side so
  * dHash/WHT near-dup runs on real compressed formats).
  *
  * REPLAYABLE ARITHMETIC (the t136/t137 oracle contract): every
  * lossy step is ORDER-FREE INTEGER math —
  *
  *  - DCT both directions through one Q13 fixed-point kernel
  *    [[DctK]] (`K(u,v,x,y) = round(a(u)·a(v)/4 ·
  *    cos((2x+1)uπ/16) · cos((2y+1)vπ/16) · 8192)`, computed once
  *    here and embedded as LITERALS in oracles — no cross-engine
  *    cos() trust): coefficient/pixel sums are 64-term integer dot
  *    products, so any summation order gives the same value, which
  *    is what lets DuckDB replay them as SUM() over a join;
  *  - descale: `floorDiv(v + 4096, 8192)` (SQL:
  *    `floor((v + 4096) / 8192.0)` — exact, v ≪ 2⁵²);
  *  - quantize: `floorDiv(2F + Q, 2Q)` (round-half-up), dequantize
  *    `q·Q`;
  *  - color: JFIF YCbCr in Q8 fixed point (encode
  *    `Y = (77R + 150G + 29B) >> 8` etc, decode
  *    `R = Y + floorDiv(359·(Cr−128), 256)` etc, clamp 0..255);
  *  - 4:2:0 chroma: downsample = 2×2 mean `(a+b+c+d+2) >> 2`,
  *    upsample = REPLICATION (plane index `x/2, y/2`) — T.81 leaves
  *    upsampling filter choice to the decoder; replication is this
  *    decoder's pinned choice.
  *
  * The entropy layer (canonical Huffman, byte stuffing, DC
  * prediction, zigzag) is exact transport: decode(encode(tile))
  * equals the arithmetic chain above with no bitstream term, and
  * the decoder reads DQT/DHT from the stream rather than assuming
  * the encoder's tables. Unsupported shapes (progressive SOF2,
  * 12-bit, arithmetic coding, >2 sampling factors) and every torn /
  * malformed input return None — never throw (CodecFuzzSpec).
  */
object Jpeg {

  /** Decoded image: `comps` 1 (pixels = w·h luma) or 3 (pixels =
    * w·h·3 interleaved RGB). */
  final case class Image(width: Int, height: Int, comps: Int,
      pixels: Array[Int])

  // ---------------------------------------------------------------
  // fixed-point DCT kernel
  // ---------------------------------------------------------------

  val DctShift = 13
  private val DctHalf = 1 << (DctShift - 1)

  /** Max w·h a decode will allocate for (4096×4096). Headers can
    * claim up to 65535×65535, which would overflow Int math and
    * demand multi-GB plane buffers from a few bytes of input. */
  val MaxDecodePixels: Long = 1L << 24

  /** Q13 DCT basis, indexed `[(v*8 + u) * 64 + (y*8 + x)]`. Shared by
    * the forward and inverse transforms (the 2D DCT-II/III pair use
    * the same a(u)a(v)/4·cos·cos kernel). */
  val DctK: Array[Int] = {
    val k = new Array[Int](4096)
    val inv = 1.0 / math.sqrt(2.0)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        val au = if (u == 0) inv else 1.0
        val av = if (v == 0) inv else 1.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val c = au * av / 4.0 *
              math.cos((2 * x + 1) * u * math.Pi / 16.0) *
              math.cos((2 * y + 1) * v * math.Pi / 16.0)
            k((v * 8 + u) * 64 + (y * 8 + x)) =
              math.rint(c * (1 << DctShift)).toInt
            x += 1
          }
          y += 1
        }
        u += 1
      }
      v += 1
    }
    k
  }

  /** Forward DCT + quantize: 64 pixels (row-major, 0..255) → 64
    * quantized coefficients (natural order v*8+u). `quant` natural
    * order. */
  def fdctQuant(block: Array[Int], quant: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var uv = 0
    while (uv < 64) {
      var acc = 0L
      var xy = 0
      val base = uv * 64
      while (xy < 64) {
        acc += DctK(base + xy).toLong * (block(xy) - 128)
        xy += 1
      }
      val f = Math.floorDiv(acc + DctHalf, 1L << DctShift)
      val q = quant(uv)
      out(uv) = Math.floorDiv(2 * f + q, 2L * q).toInt
      uv += 1
    }
    out
  }

  /** Dequantize + inverse DCT: 64 quantized coefficients (natural
    * order) → 64 pixels (row-major, clamped 0..255). */
  def dequantIdct(coefs: Array[Int], quant: Array[Int]): Array[Int] = {
    // r12 perf: real blocks are SPARSE after quantization (typically
    // a handful of nonzero coefficients out of 64) — gather the
    // nonzero (index, value) pairs once and run the per-pixel fold
    // over just those. Zero terms contribute exactly 0 to the integer
    // accumulator, so the sum — and every decoded pixel — is
    // bit-identical to the dense fold (JpegSpec's oracle replays pin
    // it); the work drops from 64 to nnz multiply-adds per pixel.
    val d = new Array[Long](64)
    val nzIdx = new Array[Int](64)
    var nnz = 0
    var i = 0
    while (i < 64) {
      val v = coefs(i).toLong * quant(i)
      if (v != 0L) { d(nnz) = v; nzIdx(nnz) = i * 64; nnz += 1 }
      i += 1
    }
    val out = new Array[Int](64)
    if (nnz == 1 && nzIdx(0) == 0) {
      // DC-only block: every pixel shares one value
      val p = Math.floorDiv(DctK(0) * d(0) + DctHalf, 1L << DctShift) + 128
      val pv = if (p < 0) 0 else if (p > 255) 255 else p.toInt
      java.util.Arrays.fill(out, pv)
      return out
    }
    var xy = 0
    while (xy < 64) {
      var acc = 0L
      var k = 0
      while (k < nnz) {
        acc += DctK(nzIdx(k) + xy) * d(k)
        k += 1
      }
      val p = Math.floorDiv(acc + DctHalf, 1L << DctShift) + 128
      out(xy) = if (p < 0) 0 else if (p > 255) 255 else p.toInt
      xy += 1
    }
    out
  }

  // ---------------------------------------------------------------
  // spec example tables (T.81 Annex K — data printed in the spec)
  // ---------------------------------------------------------------

  /** Annex K.1 luminance quantization, natural (row-major) order. */
  val StdQuantLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance quantization, natural order. */
  val StdQuantChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Annex K.3 DC luminance code lengths (BITS) + symbols. */
  val StdDcLumaBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  val StdDcLumaVals: Array[Int] = (0 to 11).toArray

  val StdDcChromaBits: Array[Int] =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  val StdDcChromaVals: Array[Int] = (0 to 11).toArray

  val StdAcLumaBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  val StdAcLumaVals: Array[Int] = Array(
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

  val StdAcChromaBits: Array[Int] =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  val StdAcChromaVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Quality-scaled quantization table (the standard libjpeg-style
    * linear scaling, public arithmetic): quality 1..100 maps to
    * `scale = q < 50 ? 5000/q : 200 − 2q` percent and each base entry
    * becomes `clamp((base·scale + 50) / 100, 1, 255)` (integer floor
    * division — q=50 reproduces the base table exactly, 100 is
    * all-ones ≈ near-lossless, low q coarsens). Deterministic, so a
    * gate pinning a quality level replays the scaled table the same
    * way both engines see it. */
  def qualityQuant(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality 1..100: $quality")
    require(base.length == 64)
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map { b =>
      val v = (b * scale + 50) / 100
      if (v < 1) 1 else if (v > 255) 255 else v
    }
  }

  /** Zigzag scan: position k → natural index (row*8 + col). Derived
    * by the anti-diagonal walk, not transcribed. */
  val ZigZag: Array[Int] = {
    val out = new Array[Int](64)
    var k = 0
    var d = 0
    while (d < 15) {
      // even diagonals walk bottom-left → top-right, odd the reverse
      val range = 0 to d
      val rows = if (d % 2 == 0) range.reverse else range
      rows.foreach { r =>
        val c = d - r
        if (r < 8 && c < 8) { out(k) = r * 8 + c; k += 1 }
      }
      d += 1
    }
    out
  }

  // ---------------------------------------------------------------
  // color transform (JFIF, Q8 fixed point)
  // ---------------------------------------------------------------

  private def clamp8(v: Long): Int =
    if (v < 0) 0 else if (v > 255) 255 else v.toInt

  /** RGB → (Y, Cb, Cr), each 0..255. */
  def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = (
    clamp8((77L * r + 150L * g + 29L * b) >> 8),
    clamp8(((-43L * r - 85L * g + 128L * b) >> 8) + 128),
    clamp8(((128L * r - 107L * g - 21L * b) >> 8) + 128))

  /** (Y, Cb, Cr) → RGB, each clamped 0..255. */
  def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = (
    clamp8(y + Math.floorDiv(359L * (cr - 128), 256L)),
    clamp8(y - Math.floorDiv(88L * (cb - 128) + 183L * (cr - 128), 256L)),
    clamp8(y + Math.floorDiv(454L * (cb - 128), 256L)))

  // ---------------------------------------------------------------
  // entropy coding
  // ---------------------------------------------------------------

  /** Canonical codes from a (BITS, HUFFVAL) pair: symbol → (code,
    * length). */
  private def buildCodes(bits: Array[Int],
      vals: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](vals.length)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out(k) = (code, len); code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out
  }

  private final class BitWriter {
    val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def put(value: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >> i) & 1)
        n += 1
        if (n == 8) {
          buf.write(acc)
          if (acc == 0xff) buf.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) {
      acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1) // 1-fill
      buf.write(acc)
      if (acc == 0xff) buf.write(0x00)
      acc = 0; n = 0
    }
  }

  /** Magnitude category (number of bits) of a coefficient. */
  private def csize(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** T.81 F1.4.1: value bits for a coefficient of size s (negative
    * values store v - 1 in s bits). */
  private def valueBits(v: Int, s: Int): Int =
    if (v >= 0) v else v - 1 + (1 << s) // two's complement low bits

  // ---------------------------------------------------------------
  // encoder
  // ---------------------------------------------------------------

  private def writeSeg(out: java.io.ByteArrayOutputStream, marker: Int,
      payload: Array[Int]): Unit = {
    out.write(0xff); out.write(marker)
    val len = payload.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    payload.foreach(b => out.write(b & 0xff))
  }

  private def dqtPayload(id: Int, quant: Array[Int]): Array[Int] =
    id +: ZigZag.map(quant) // Pq=0 (8-bit), Tq=id

  private def dhtPayload(clazz: Int, id: Int, bits: Array[Int],
      vals: Array[Int]): Array[Int] =
    ((clazz << 4) | id) +: (bits ++ vals)

  /** One block's Huffman encoding (shared by gray and color). Returns
    * the new DC predictor. `acIdx` maps AC symbols to their index in
    * the table backing `acCodes`. */
  private def encodeBlock(bw: BitWriter, coefs: Array[Int],
      dcCodes: Array[(Int, Int)], acCodes: Array[(Int, Int)],
      acIdx: Map[Int, Int], pred: Int): Int = {
    val dc = coefs(0)
    val diff = dc - pred
    val s = csize(diff)
    val (dcode, dlen) = dcCodes(s)
    bw.put(dcode, dlen)
    if (s > 0) bw.put(valueBits(diff, s) & ((1 << s) - 1), s)
    // AC in zigzag order with run-lengths
    var run = 0
    var k = 1
    while (k < 64) {
      val v = coefs(ZigZag(k))
      if (v == 0) run += 1
      else {
        while (run > 15) {
          val (zc, zl) = acCodes(acIdx(0xf0)); bw.put(zc, zl)
          run -= 16
        }
        val sz = csize(v)
        val (c, l) = acCodes(acIdx((run << 4) | sz))
        bw.put(c, l)
        bw.put(valueBits(v, sz) & ((1 << sz) - 1), sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (c, l) = acCodes(acIdx(0x00)); bw.put(c, l) }
    dc
  }

  // symbol → index in the Std AC tables (built once per table)
  private val acLumaIdx: Map[Int, Int] =
    StdAcLumaVals.zipWithIndex.toMap
  private val acChromaIdx: Map[Int, Int] =
    StdAcChromaVals.zipWithIndex.toMap

  /** Extract the 8×8 block at (bx, by) from a plane, replicating
    * edges (the pad choice keeps gradients flat, minimizing ringing
    * — and is replayed by the oracle's LEAST() clamp). */
  private def blockAt(plane: Array[Int], w: Int, h: Int, bx: Int,
      by: Int): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      val sy = math.min(by * 8 + y, h - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(bx * 8 + x, w - 1)
        out(y * 8 + x) = plane(sy * w + sx)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode a grayscale image (`pixels` row-major 0..255) as a
    * baseline JFIF JPEG with the Annex K luminance tables. */
  def encodeGray(pixels: Array[Int], w: Int, h: Int,
      quant: Array[Int] = StdQuantLuma): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length == w * h)
    require(quant.forall(q => q >= 1 && q <= 255))
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    writeSeg(out, 0xdb, dqtPayload(0, quant))
    writeSeg(out, 0xc0, Array(8, (h >> 8) & 0xff, h & 0xff,
      (w >> 8) & 0xff, w & 0xff, 1, /*comp id*/ 1, 0x11, 0))
    writeSeg(out, 0xc4, dhtPayload(0, 0, StdDcLumaBits, StdDcLumaVals))
    writeSeg(out, 0xc4, dhtPayload(1, 0, StdAcLumaBits, StdAcLumaVals))
    writeSeg(out, 0xda, Array(1, 1, 0x00, 0, 63, 0))
    val dcCodes = buildCodes(StdDcLumaBits, StdDcLumaVals)
    val acCodes = buildCodes(StdAcLumaBits, StdAcLumaVals)
    val bw = new BitWriter
    var pred = 0
    val bxs = (w + 7) / 8
    val bys = (h + 7) / 8
    var by = 0
    while (by < bys) {
      var bx = 0
      while (bx < bxs) {
        val q = fdctQuant(blockAt(pixels, w, h, bx, by), quant)
        pred = encodeBlock(bw, q, dcCodes, acCodes, acLumaIdx, pred)
        bx += 1
      }
      by += 1
    }
    bw.flush()
    bw.buf.toByteArray.foreach(b => out.write(b & 0xff))
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode interleaved RGB (row-major, 3 ints per pixel) as a
    * baseline 4:2:0 YCbCr JPEG (Annex K tables, luma id 0 / chroma
    * id 1). */
  def encodeColor420(rgb: Array[Int], w: Int, h: Int,
      quantY: Array[Int] = StdQuantLuma,
      quantC: Array[Int] = StdQuantChroma): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3)
    // planes: Y at full res; Cb/Cr at ceil/2 with 2×2 mean (edge
    // replication for odd sizes)
    val yP = new Array[Int](w * h)
    val cw = (w + 1) / 2
    val ch = (h + 1) / 2
    val cbP = new Array[Int](cw * ch)
    val crP = new Array[Int](cw * ch)
    val cbF = new Array[Int](w * h)
    val crF = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val (y, cb, cr) = rgbToYcc(rgb(3 * i), rgb(3 * i + 1),
        rgb(3 * i + 2))
      yP(i) = y; cbF(i) = cb; crF(i) = cr
      i += 1
    }
    var cy = 0
    while (cy < ch) {
      var cx = 0
      while (cx < cw) {
        def at(p: Array[Int], dx: Int, dy: Int): Int = {
          val sx = math.min(2 * cx + dx, w - 1)
          val sy = math.min(2 * cy + dy, h - 1)
          p(sy * w + sx)
        }
        cbP(cy * cw + cx) = (at(cbF, 0, 0) + at(cbF, 1, 0) +
          at(cbF, 0, 1) + at(cbF, 1, 1) + 2) >> 2
        crP(cy * cw + cx) = (at(crF, 0, 0) + at(crF, 1, 0) +
          at(crF, 0, 1) + at(crF, 1, 1) + 2) >> 2
        cx += 1
      }
      cy += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    writeSeg(out, 0xdb, dqtPayload(0, quantY))
    writeSeg(out, 0xdb, dqtPayload(1, quantC))
    writeSeg(out, 0xc0, Array(8, (h >> 8) & 0xff, h & 0xff,
      (w >> 8) & 0xff, w & 0xff, 3,
      1, 0x22, 0, // Y: 2x2 sampling, quant 0
      2, 0x11, 1, // Cb
      3, 0x11, 1)) // Cr
    writeSeg(out, 0xc4, dhtPayload(0, 0, StdDcLumaBits, StdDcLumaVals))
    writeSeg(out, 0xc4, dhtPayload(1, 0, StdAcLumaBits, StdAcLumaVals))
    writeSeg(out, 0xc4,
      dhtPayload(0, 1, StdDcChromaBits, StdDcChromaVals))
    writeSeg(out, 0xc4,
      dhtPayload(1, 1, StdAcChromaBits, StdAcChromaVals))
    writeSeg(out, 0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val dcY = buildCodes(StdDcLumaBits, StdDcLumaVals)
    val acY = buildCodes(StdAcLumaBits, StdAcLumaVals)
    val dcC = buildCodes(StdDcChromaBits, StdDcChromaVals)
    val acC = buildCodes(StdAcChromaBits, StdAcChromaVals)
    val bw = new BitWriter
    var predY = 0
    var predCb = 0
    var predCr = 0
    val mcusX = (w + 15) / 16
    val mcusY = (h + 15) / 16
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var sub = 0
        while (sub < 4) {
          val q = fdctQuant(blockAt(yP, w, h,
            mx * 2 + (sub & 1), my * 2 + (sub >> 1)), quantY)
          predY = encodeBlock(bw, q, dcY, acY, acLumaIdx, predY)
          sub += 1
        }
        val qcb = fdctQuant(blockAt(cbP, cw, ch, mx, my), quantC)
        predCb = encodeBlock(bw, qcb, dcC, acC, acChromaIdx, predCb)
        val qcr = fdctQuant(blockAt(crP, cw, ch, mx, my), quantC)
        predCr = encodeBlock(bw, qcr, dcC, acC, acChromaIdx, predCr)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    bw.buf.toByteArray.foreach(b => out.write(b & 0xff))
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // decoder
  // ---------------------------------------------------------------

  private final class BitReader(bytes: Array[Byte], private var p: Int) {
    private var acc = 0
    private var n = 0
    var truncated = false
    def pos: Int = p
    /** Next bit, or -1 at a marker / end of data. */
    def bit(): Int = {
      if (n == 0) {
        if (p >= bytes.length) { truncated = true; return -1 }
        val b = bytes(p) & 0xff
        if (b == 0xff) {
          if (p + 1 >= bytes.length) { truncated = true; return -1 }
          val b2 = bytes(p + 1) & 0xff
          if (b2 == 0x00) { acc = 0xff; p += 2 }
          else return -1 // a real marker terminates the scan
        } else { acc = b; p += 1 }
        n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def bits(len: Int): Int = {
      var v = 0
      var i = 0
      while (i < len) {
        val b = bit()
        if (b < 0) { truncated = true; return -1 }
        v = (v << 1) | b
        i += 1
      }
      v
    }
    /** Skip to and consume an RSTn marker; false if none present. */
    def restart(): Boolean = {
      n = 0
      if (p + 1 < bytes.length && (bytes(p) & 0xff) == 0xff &&
          ((bytes(p + 1) & 0xff) & 0xf8) == 0xd0) {
        p += 2; true
      } else false
    }
  }

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // T.81 F2.2.3 DECODE: mincode/maxcode/valptr per length
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = code - 1
        if (bits(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = 0
      var l = 0
      while (l < 16) {
        val b = br.bit()
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
        if (maxCode(l) >= 0 && code <= maxCode(l) &&
            code >= minCode(l)) {
          val idx = valPtr(l) + code - minCode(l)
          if (idx >= vals.length) return -1
          return vals(idx)
        }
      }
      -1
    }
  }

  /** T.81 F2.2.1 EXTEND: value bits → signed coefficient. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def u16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

  /** Decode a baseline JPEG. None for progressive/12-bit/arithmetic/
    * malformed/torn inputs — never throws. */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
        (bytes(1) & 0xff) != 0xd8) return None
    val quants = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var w = 0
    var h = 0
    var nc = 0
    // per component: id, hs, vs, quant id
    var comps: Array[(Int, Int, Int, Int)] = null
    var restartInterval = 0
    var p = 2
    while (p + 3 < bytes.length) {
      if ((bytes(p) & 0xff) != 0xff) return None
      val m = bytes(p + 1) & 0xff
      if (m == 0xd8) { p += 2 }
      else if (m == 0xd9) return None // EOI before any scan
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) p += 2
      else {
        if (p + 4 > bytes.length) return None
        val len = u16(bytes, p + 2)
        if (len < 2 || p + 2 + len > bytes.length) return None
        val seg = p + 4
        val segLen = len - 2
        m match {
          case 0xdb => // DQT: one or more tables
            var q = seg
            while (q < seg + segLen) {
              if (q >= bytes.length) return None
              val pq = (bytes(q) & 0xff) >> 4
              val tq = bytes(q) & 0x0f
              if (pq != 0 || tq > 3 || q + 65 > seg + segLen)
                return None
              val tbl = new Array[Int](64)
              var k = 0
              while (k < 64) {
                tbl(ZigZag(k)) = bytes(q + 1 + k) & 0xff; k += 1
              }
              quants(tq) = tbl
              q += 65
            }
          case 0xc4 => // DHT: one or more tables
            var q = seg
            while (q < seg + segLen) {
              val tc = (bytes(q) & 0xff) >> 4
              val th = bytes(q) & 0x0f
              if (tc > 1 || th > 3 || q + 17 > seg + segLen)
                return None
              val bits = (0 until 16).map(i =>
                bytes(q + 1 + i) & 0xff).toArray
              val nv = bits.sum
              if (q + 17 + nv > seg + segLen || nv > 256) return None
              val vals = (0 until nv).map(i =>
                bytes(q + 17 + i) & 0xff).toArray
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              q += 17 + nv
            }
          case 0xc0 => // SOF0 baseline
            if (segLen < 6) return None
            if ((bytes(seg) & 0xff) != 8) return None
            h = u16(bytes, seg + 1)
            w = u16(bytes, seg + 3)
            nc = bytes(seg + 5) & 0xff
            if (w == 0 || h == 0 || (nc != 1 && nc != 3) ||
                segLen < 6 + 3 * nc) return None
            // Allocation guard: plane arrays are ~w*h ints each and
            // the RGB output is w*h*3; a 16-byte header claiming
            // 65535x65535 would demand multi-GB buffers (and
            // w*h as Int can overflow). Reject anything above a
            // 2^24-pixel budget (4096x4096) before allocating.
            if (w.toLong * h > MaxDecodePixels) return None
            comps = (0 until nc).map { i =>
              val o = seg + 6 + 3 * i
              val id = bytes(o) & 0xff
              val hs = (bytes(o + 1) & 0xff) >> 4
              val vs = bytes(o + 1) & 0x0f
              val tq = bytes(o + 2) & 0xff
              (id, hs, vs, tq)
            }.toArray
            if (comps.exists { case (_, hs, vs, tq) =>
              hs < 1 || hs > 2 || vs < 1 || vs > 2 || tq > 3
            }) return None
          case 0xc2 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 |
              0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // only baseline sequential SOF0
          case 0xdd =>
            if (segLen < 2) return None
            restartInterval = u16(bytes, seg)
          case 0xda =>
            if (comps == null) return None
            if (segLen < 1) return None
            val ns = bytes(seg) & 0xff
            if (ns != nc || segLen < 1 + 2 * ns + 3) return None
            // scan component → (dc table, ac table)
            val scanTabs = new Array[(Int, Int)](nc)
            var ok = true
            (0 until ns).foreach { i =>
              val cid = bytes(seg + 1 + 2 * i) & 0xff
              val tt = bytes(seg + 2 + 2 * i) & 0xff
              val ci = comps.indexWhere(_._1 == cid)
              // Td/Ta are 4-bit on the wire but dcTabs/acTabs only
              // hold baseline ids 0..3; a repeated cid would leave
              // another scanTabs slot null — both must reject, not
              // throw (never-throw decode contract).
              if (ci < 0 || ((tt >> 4) & 0x0f) > 3 ||
                  (tt & 0x0f) > 3 || scanTabs(ci) != null) ok = false
              else scanTabs(ci) = ((tt >> 4) & 0x0f, tt & 0x0f)
            }
            if (!ok || scanTabs.exists(_ == null)) return None
            return decodeScan(bytes, p + 2 + len, w, h, comps,
              scanTabs, quants, dcTabs, acTabs, restartInterval)
          case _ => () // APPn, COM, others: skip
        }
        p += 2 + len
      }
    }
    None
  }

  private def decodeScan(bytes: Array[Byte], scanStart: Int, w: Int,
      h: Int, comps: Array[(Int, Int, Int, Int)],
      scanTabs: Array[(Int, Int)], quants: Array[Array[Int]],
      dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
      restartInterval: Int): Option[Image] = {
    val nc = comps.length
    val hmax = comps.map(_._2).max
    val vmax = comps.map(_._3).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // component planes, padded to whole MCUs
    val planeW = comps.map(c => mcusX * c._2 * 8)
    val planeH = comps.map(c => mcusY * c._3 * 8)
    val planes = (0 until nc).map(i =>
      new Array[Int](planeW(i) * planeH(i))).toArray
    (0 until nc).foreach { i =>
      val (dcT, acT) = scanTabs(i)
      if (dcTabs(dcT) == null || acTabs(acT) == null ||
          quants(comps(i)._4) == null) return None
    }
    val br = new BitReader(bytes, scanStart)
    val preds = new Array[Int](nc)
    val coefs = new Array[Int](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 &&
          mcu % restartInterval == 0) {
        if (!br.restart()) return None
        java.util.Arrays.fill(preds, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < nc) {
        val (_, hs, vs, tq) = comps(ci)
        val dcT = dcTabs(scanTabs(ci)._1)
        val acT = acTabs(scanTabs(ci)._2)
        var sub = 0
        while (sub < hs * vs) {
          val bx = mx * hs + (sub % hs)
          val by = my * vs + (sub / hs)
          java.util.Arrays.fill(coefs, 0)
          // DC
          val s = dcT.decode(br)
          if (s < 0 || s > 11) return None
          val dv = if (s == 0) 0 else {
            val raw = br.bits(s)
            if (raw < 0) return None
            extend(raw, s)
          }
          preds(ci) += dv
          coefs(0) = preds(ci)
          // AC
          var k = 1
          while (k < 64) {
            val rs = acT.decode(br)
            if (rs < 0) return None
            val r = rs >> 4
            val sz = rs & 0x0f
            if (sz == 0) {
              if (r == 15) k += 16 // ZRL
              else k = 64 // EOB
            } else {
              k += r
              if (k > 63) return None
              val raw = br.bits(sz)
              if (raw < 0) return None
              coefs(ZigZag(k)) = extend(raw, sz)
              k += 1
            }
          }
          val px = dequantIdct(coefs, quants(tq))
          // place block into the plane
          val pw = planeW(ci)
          var y = 0
          while (y < 8) {
            System.arraycopy(px, y * 8, planes(ci),
              (by * 8 + y) * pw + bx * 8, 8)
            y += 1
          }
          sub += 1
        }
        ci += 1
      }
      mcu += 1
    }
    if (nc == 1) {
      val out = new Array[Int](w * h)
      val pw = planeW(0)
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * pw, out, y * w, w)
        y += 1
      }
      Some(Image(w, h, 1, out))
    } else {
      val out = new Array[Int](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def sampleOf(ci: Int): Int = {
            val (_, hs, vs, _) = comps(ci)
            val sx = x * hs / hmax
            val sy = y * vs / vmax
            planes(ci)(sy * planeW(ci) + sx)
          }
          val (r, g, b) =
            yccToRgb(sampleOf(0), sampleOf(1), sampleOf(2))
          val o = (y * w + x) * 3
          out(o) = r; out(o + 1) = g; out(o + 2) = b
          x += 1
        }
        y += 1
      }
      Some(Image(w, h, 3, out))
    }
  }

  // ---------------------------------------------------------------
  // DuckDB oracle builders (t136/t137): replay the arithmetic chain
  // with the Q13 kernel embedded as LITERALS — same integer sums in
  // any order, same floor-division descale/quantize, so the SQL
  // result equals decode(encode(tile)) bit for bit.
  // ---------------------------------------------------------------

  /** CTE `__jp_k(uv, xy, k)` — the 4096 kernel literals. Splice once
    * per oracle. */
  def duckKernelSql(): String = {
    val ks = DctK.mkString("[", ", ", "]")
    s"""__jp_k AS (
       |  SELECT (i - 1) // 64 AS uv, (i - 1) % 64 AS xy, k FROM (
       |    SELECT unnest($ks) AS k,
       |           unnest(range(1, 4097)) AS i))""".stripMargin
  }

  /** CTE `name(uv, q)` for a quantization table. */
  def duckQuantSql(name: String, quant: Array[Int]): String = {
    val qs = quant.mkString("[", ", ", "]")
    s"""$name AS (
       |  SELECT unnest(range(0, 64)) AS uv, unnest($qs) AS q)""".stripMargin
  }

  /** The per-block round-trip chain (fdctQuant → dequantIdct) over a
    * relation `tilesRel(keyCols..., xy, p)` (xy = y*8+x in the block,
    * p = 0..255), quantized by `qRel(uv, q)`: emits `${prefix}_f`,
    * `${prefix}_d` and `${prefix}_r(keyCols..., xy, px)`. Requires
    * [[duckKernelSql]] spliced first. `keyCols` comma-separated
    * (e.g. "doc_id" or "doc_id, blk"). */
  def duckChainSql(prefix: String, tilesRel: String, keyCols: String,
      qRel: String): String = {
    val keysT = keyCols.split(",").map(c => s"t.${c.trim}")
      .mkString(", ")
    val keysF = keyCols.split(",").map(c => s"f.${c.trim}")
      .mkString(", ")
    val keysD = keyCols.split(",").map(c => s"d.${c.trim}")
      .mkString(", ")
    val nKeys = keyCols.split(",").length
    val grpA = (1 to nKeys + 1).mkString(", ")
    s"""${prefix}_f AS (
       |  SELECT $keysT, k.uv, CAST(floor(
       |      (SUM(CAST(k.k AS BIGINT) * (t.p - 128)) + $DctHalf)
       |        / ${1 << DctShift}.0) AS BIGINT) AS f
       |  FROM $tilesRel t JOIN __jp_k k ON k.xy = t.xy
       |  GROUP BY $grpA),
       |${prefix}_d AS (
       |  SELECT $keysF, f.uv,
       |      CAST(floor((2 * f.f + q.q) / (2.0 * q.q)) AS BIGINT)
       |        * q.q AS d
       |  FROM ${prefix}_f f JOIN $qRel q ON q.uv = f.uv),
       |${prefix}_r AS (
       |  SELECT $keysD, k.xy, LEAST(255, GREATEST(0, CAST(floor(
       |      (SUM(CAST(k.k AS BIGINT) * d.d) + $DctHalf)
       |        / ${1 << DctShift}.0) AS BIGINT) + 128)) AS px
       |  FROM ${prefix}_d d JOIN __jp_k k ON k.uv = d.uv
       |  GROUP BY $grpA)""".stripMargin
  }

  /** Luma plane of a decoded JPEG (gray passthrough; for color the
    * RECONSTRUCTED Y — what dHash/WHT near-dup consumes). */
  def decodeLuma(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decode(bytes).map { img =>
      if (img.comps == 1) (img.width, img.height, img.pixels)
      else {
        val g = new Array[Int](img.width * img.height)
        var i = 0
        while (i < g.length) {
          val (r, gg, b) =
            (img.pixels(3 * i), img.pixels(3 * i + 1),
              img.pixels(3 * i + 2))
          // back to Y by the same Q8 weights (clamped)
          g(i) = clamp8((77L * r + 150L * gg + 29L * b) >> 8)
          i += 1
        }
        (img.width, img.height, g)
      }
    }
}
