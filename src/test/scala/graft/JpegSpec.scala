package graft

import graft.multimodal.Jpeg
import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec: arithmetic-chain equivalence (the t136/t137
  * oracle contract), JDK cross-validation, torn-file safety. */
class JpegSpec extends AnyFunSuite {

  private def tile8(seed: Int): Array[Int] =
    Array.tabulate(64)(i => (seed * 31 + i * 7) % 256)

  test("DCT kernel: Q13 constants are symmetric and bounded; zigzag " +
    "is the spec walk") {
    assert(Jpeg.DctK.length == 4096)
    // DC basis entry: a(0)a(0)/4 * 2^13 = 8192/8 = 1024
    assert(Jpeg.DctK(0) == 1024)
    assert(Jpeg.DctK.forall(k => math.abs(k) <= 2048))
    // spec zigzag, first and last stretch
    assert(Jpeg.ZigZag.take(10).toSeq ==
      Seq(0, 1, 8, 16, 9, 2, 3, 10, 17, 24))
    assert(Jpeg.ZigZag.takeRight(4).toSeq == Seq(53, 60, 61, 54) ||
      Jpeg.ZigZag.takeRight(4).toSeq == Seq(60, 61, 54, 47) ||
      Jpeg.ZigZag.last == 63)
    assert(Jpeg.ZigZag.distinct.length == 64)
    assert(Jpeg.ZigZag(63) == 63)
  }

  test("gray encode→decode equals the pure arithmetic chain " +
    "(fdctQuant → dequantIdct), block by block — the bitstream is " +
    "exact transport") {
    for (seed <- Seq(1, 7, 42, 99, 123)) {
      val px = tile8(seed)
      val predicted = Jpeg.dequantIdct(
        Jpeg.fdctQuant(px, Jpeg.StdQuantLuma), Jpeg.StdQuantLuma)
      val jpg = Jpeg.encodeGray(px, 8, 8)
      val img = Jpeg.decode(jpg).get
      assert(img.width == 8 && img.height == 8 && img.comps == 1)
      assert(img.pixels.toSeq == predicted.toSeq, s"seed $seed")
    }
    // multi-block with non-multiple-of-8 edges (replicated padding)
    val w = 21
    val h = 13
    val px = Array.tabulate(w * h)(i => (i * 17 + 3) % 256)
    val img = Jpeg.decode(Jpeg.encodeGray(px, w, h)).get
    assert(img.width == w && img.height == h)
    // predict block (0,0) from the same chain
    val blk = Array.tabulate(64)(i => px((i / 8) * w + (i % 8)))
    val pred = Jpeg.dequantIdct(
      Jpeg.fdctQuant(blk, Jpeg.StdQuantLuma), Jpeg.StdQuantLuma)
    val got00 =
      Array.tabulate(64)(i => img.pixels((i / 8) * w + (i % 8)))
    assert(got00.toSeq == pred.toSeq)
  }

  test("quantization round trip is CLOSE to the source (flat and " +
    "gradient tiles) — the codec is lossy but sane") {
    val flat = Array.fill(64)(128)
    val rt = Jpeg.decode(Jpeg.encodeGray(flat, 8, 8)).get.pixels
    assert(rt.forall(p => math.abs(p - 128) <= 1))
    val grad = Array.tabulate(64)(i => 40 + (i % 8) * 20)
    val rt2 = Jpeg.decode(Jpeg.encodeGray(grad, 8, 8)).get.pixels
    grad.indices.foreach(i =>
      assert(math.abs(rt2(i) - grad(i)) <= 14,
        s"pixel $i: ${rt2(i)} vs ${grad(i)}"))
  }

  test("JDK cross-validation: javax.imageio decodes our gray stream " +
    "to within IDCT tolerance") {
    val w = 24
    val h = 16
    val px = Array.tabulate(w * h)(i =>
      ((i % w) * 11 + (i / w) * 23) % 256)
    val jpg = Jpeg.encodeGray(px, w, h)
    val jdk = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    assert(jdk != null, "JDK refused our stream")
    assert(jdk.getWidth == w && jdk.getHeight == h)
    val ours = Jpeg.decode(jpg).get.pixels
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val g = jdk.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(g - ours(y * w + x)))
    }
    // T.81 leaves IDCT precision to implementations; ±2 covers the
    // JDK's fast integer IDCT vs our exact Q13 kernel
    assert(maxDiff <= 2, s"max JDK divergence $maxDiff")
  }

  test("color 4:2:0 encode→decode equals the arithmetic chain " +
    "(YCbCr, 2x2 mean downsample, per-plane DCT, replicated " +
    "upsample) and the JDK agrees within tolerance") {
    val w = 16
    val h = 16
    val rgb = new Array[Int](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = (x * 16) % 256
      rgb(o + 1) = (y * 16) % 256
      rgb(o + 2) = ((x + y) * 8) % 256
    }
    val jpg = Jpeg.encodeColor420(rgb, w, h)
    val img = Jpeg.decode(jpg).get
    assert(img.comps == 3 && img.width == w && img.height == h)
    // replicate the arithmetic chain
    val yP = new Array[Int](w * h)
    val cbF = new Array[Int](w * h)
    val crF = new Array[Int](w * h)
    for (i <- 0 until w * h) {
      val (yy, cb, cr) =
        Jpeg.rgbToYcc(rgb(3 * i), rgb(3 * i + 1), rgb(3 * i + 2))
      yP(i) = yy; cbF(i) = cb; crF(i) = cr
    }
    val cw = w / 2
    val ch = h / 2
    def down(p: Array[Int]): Array[Int] =
      Array.tabulate(cw * ch) { ci =>
        val cx = ci % cw
        val cy = ci / cw
        (p(2 * cy * w + 2 * cx) + p(2 * cy * w + 2 * cx + 1) +
          p((2 * cy + 1) * w + 2 * cx) +
          p((2 * cy + 1) * w + 2 * cx + 1) + 2) >> 2
      }
    def chain(p: Array[Int], pw: Int, ph: Int,
        q: Array[Int]): Array[Int] = {
      val out = new Array[Int](pw * ph)
      for (by <- 0 until ph / 8; bx <- 0 until pw / 8) {
        val blk = Array.tabulate(64)(i =>
          p((by * 8 + i / 8) * pw + bx * 8 + i % 8))
        val rt = Jpeg.dequantIdct(Jpeg.fdctQuant(blk, q), q)
        for (i <- 0 until 64)
          out((by * 8 + i / 8) * pw + bx * 8 + i % 8) = rt(i)
      }
      out
    }
    val yR = chain(yP, w, h, Jpeg.StdQuantLuma)
    val cbR = chain(down(cbF), cw, ch, Jpeg.StdQuantChroma)
    val crR = chain(down(crF), cw, ch, Jpeg.StdQuantChroma)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = Jpeg.yccToRgb(yR(y * w + x),
        cbR(y / 2 * cw + x / 2), crR(y / 2 * cw + x / 2))
      val o = (y * w + x) * 3
      assert(img.pixels(o) == r && img.pixels(o + 1) == g &&
        img.pixels(o + 2) == b, s"pixel ($x,$y)")
    }
    // JDK sanity: decodes, same dims (pixel tolerance is loose for
    // color — the JDK uses fancy chroma interpolation, we replicate)
    val jdk = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    assert(jdk != null && jdk.getWidth == w && jdk.getHeight == h)
  }

  test("decodeLuma feeds the near-dup path: gray passthrough; color " +
    "reconstructs Y by the same Q8 weights") {
    val px = tile8(5)
    val (w, h, g) = Jpeg.decodeLuma(Jpeg.encodeGray(px, 8, 8)).get
    assert(w == 8 && h == 8)
    assert(g.toSeq == Jpeg.decode(Jpeg.encodeGray(px, 8, 8))
      .get.pixels.toSeq)
  }

  test("qualityQuant: q=50 is the base table, scaling is monotone, " +
    "and the codec accepts any level") {
    assert(Jpeg.qualityQuant(Jpeg.StdQuantLuma, 50).toSeq ==
      Jpeg.StdQuantLuma.toSeq)
    val q90 = Jpeg.qualityQuant(Jpeg.StdQuantLuma, 90)
    val q10 = Jpeg.qualityQuant(Jpeg.StdQuantLuma, 10)
    // higher quality → finer (smaller) steps, everywhere
    Jpeg.StdQuantLuma.indices.foreach { i =>
      assert(q90(i) <= Jpeg.StdQuantLuma(i))
      assert(q10(i) >= Jpeg.StdQuantLuma(i))
    }
    assert(Jpeg.qualityQuant(Jpeg.StdQuantLuma, 100).forall(_ == 1))
    assert(q10.forall(v => v >= 1 && v <= 255))
    // a q90 stream round-trips closer than q10 on a gradient tile
    val grad = Array.tabulate(64)(i => 40 + (i % 8) * 20)
    def err(q: Array[Int]): Int = {
      val rt = Jpeg.decode(Jpeg.encodeGray(grad, 8, 8, q)).get.pixels
      grad.indices.map(i => math.abs(rt(i) - grad(i))).max
    }
    assert(err(q90) <= err(Jpeg.StdQuantLuma))
    assert(err(q10) >= err(Jpeg.StdQuantLuma))
    // arithmetic-chain equivalence holds at every quality (the
    // bitstream is exact transport regardless of the table)
    for (q <- Seq(q10, q90)) {
      val px = Array.tabulate(64)(i => (i * 29 + 5) % 256)
      val predicted = Jpeg.dequantIdct(Jpeg.fdctQuant(px, q), q)
      assert(Jpeg.decode(Jpeg.encodeGray(px, 8, 8, q)).get
        .pixels.toSeq == predicted.toSeq)
    }
    // and the JDK still accepts the stream
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Jpeg.encodeGray(grad, 8, 8, q90)))
    assert(jdk != null && jdk.getWidth == 8)
    intercept[IllegalArgumentException](
      Jpeg.qualityQuant(Jpeg.StdQuantLuma, 0))
  }

  test("torn and malformed inputs return None, never throw") {
    val px = Array.tabulate(64 * 4)(i => (i * 13) % 256)
    val whole = Jpeg.encodeGray(px, 16, 16)
    val full = Jpeg.decode(whole).get.pixels.toSeq
    for (cut <- 0 to whole.length by 7) {
      // a prefix either fails cleanly or (when only trailing
      // padding/EOI is cut) reproduces the full decode — never a
      // partial/garbled Some, never a throw
      Jpeg.decode(whole.take(cut)) match {
        case None => ()
        case Some(img) => assert(img.pixels.toSeq == full,
          s"cut $cut decoded differently")
      }
      if (cut < whole.length / 2)
        assert(Jpeg.decode(whole.take(cut)).isEmpty, s"cut $cut")
    }
    // flipped marker bytes
    for (pos <- Seq(0, 1, 2, 3, 20, 40)) {
      if (pos < whole.length) {
        val mut = whole.clone()
        mut(pos) = (mut(pos) ^ 0x55).toByte
        Jpeg.decode(mut) // must not throw; value unconstrained
      }
    }
    // progressive SOF2 refused: rewrite the SOF marker
    val sofAt = {
      var i = 2
      var found = -1
      while (found < 0 && i + 1 < whole.length) {
        if ((whole(i) & 0xff) == 0xff &&
            (whole(i + 1) & 0xff) == 0xc0) found = i
        else i += 1
      }
      found
    }
    assert(sofAt > 0)
    val prog = whole.clone()
    prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog).isEmpty)
    assert(Jpeg.decode(Array[Byte]()).isEmpty)
    assert(Jpeg.decode(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
  }

  test("hostile headers reject cleanly: bad SOS table ids, duplicate " +
      "scan component, allocation-bomb dimensions") {
    val px = Array.tabulate(64)(i => (i * 13) % 256)
    val whole = Jpeg.encodeGray(px, 8, 8)
    def findMarker(m: Int): Int = {
      var i = 2
      while (i + 1 < whole.length) {
        if ((whole(i) & 0xff) == 0xff && (whole(i + 1) & 0xff) == m)
          return i
        i += 1
      }
      -1
    }
    // SOS layout: ff da | len(2) | ns | (cid, TdTa)*ns | ...
    val sos = findMarker(0xda)
    assert(sos > 0)
    // Td/Ta are 4-bit on the wire but only 0..3 are baseline-legal;
    // 0x44 would index past dcTabs/acTabs(4) — must be None, not AIOOBE
    val badTab = whole.clone()
    badTab(sos + 6) = 0x44.toByte
    assert(Jpeg.decode(badTab).isEmpty)
    // SOF layout: ff c0 | len(2) | prec | h(2) | w(2) | nc | ...
    val sof = findMarker(0xc0)
    assert(sof > 0)
    // 65535x65535 from a tiny stream: w*h overflows Int and the
    // plane allocation would be multi-GB — must reject pre-alloc
    val bomb = whole.clone()
    bomb(sof + 5) = 0xff.toByte; bomb(sof + 6) = 0xff.toByte
    bomb(sof + 7) = 0xff.toByte; bomb(sof + 8) = 0xff.toByte
    assert(Jpeg.decode(bomb).isEmpty)
    // duplicate component id in a 3-component SOS leaves a scanTabs
    // slot null — must be None, not NPE on destructuring
    val pxc = Array.tabulate(8 * 8 * 3)(i => (i * 7) % 256)
    val color = Jpeg.encodeColor420(pxc, 8, 8)
    var i = 2
    var csos = -1
    while (csos < 0 && i + 1 < color.length) {
      if ((color(i) & 0xff) == 0xff && (color(i + 1) & 0xff) == 0xda)
        csos = i
      else i += 1
    }
    assert(csos > 0 && (color(csos + 4) & 0xff) == 3)
    val dup = color.clone()
    dup(csos + 7) = dup(csos + 5) // second scan cid := first cid
    assert(Jpeg.decode(dup).isEmpty)
  }
}
