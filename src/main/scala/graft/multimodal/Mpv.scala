package graft.multimodal

/** Motion-predicted video — the inter-frame rung above the repo's
  * intra-only video codecs (MJPEG re-decodes every frame, GIF patches
  * palette rectangles, Y4M is uncompressed): I-frames plus
  * FORWARD-PREDICTED P-frames with per-macroblock motion vectors and
  * DCT-coded residuals, the core arithmetic of ISO 11172-2 (MPEG-1)
  * video.
  *
  * CLEAN-ROOM BOUNDARY (the Mp3.scala precedent): this is the
  * PREDICTION ARITHMETIC of MPEG-1 — 16×16 macroblocks, full-pel
  * forward motion compensation, block-DCT residual coding with
  * closed-loop prediction — carried by a self-describing container
  * (`GMV1`), NOT an ISO bitstream: 11172-2's variable-length code
  * tables are spec-printed data this repo will not reconstruct from
  * memory, exactly as it declines the ISO audio tables. Every
  * curation signal inter-frame video feeds (motion magnitude, residual
  * energy, scene cuts, frame stats through a prediction chain) is
  * arithmetic-level, and the t142 oracle replays that arithmetic
  * pixel-for-pixel.
  *
  * Layout (all little-endian):
  * {{{
  * "GMV1" | u16 w | u16 h | u16 nframes        (w, h multiples of 16)
  * per frame: u8 type ('I' | 'P')
  *   I: per 8×8 block, raster order: 64 × i16 quantized coefficients
  *   P: per 16×16 macroblock, raster order:
  *      i8 mvx | i8 mvy | 4 sub-blocks × 64 × i16 residual coeffs
  * }}}
  *
  * Residual coding REUSES the JPEG fixed-point DCT kernel unchanged:
  * a residual r ∈ [−128, 127] is coded as the sample r + 128, so
  * [[Jpeg.fdctQuant]]'s −128 centering makes the transform input the
  * residual itself and [[Jpeg.dequantIdct]]'s [0, 255] clamp is the
  * residual clamp. The ENCODER is closed-loop (predicts from its own
  * reconstruction, not from source frames) — open-loop prediction
  * drifts: the decoder accumulates reconstruction error frame after
  * frame, the classic inter-coding failure mode. Residuals outside
  * [−128, 127] are clamped at encode (lossy, like any quantizer
  * decision); the decode chain is exact given the stored bytes.
  *
  * Decode totality: malformed input returns None, never throws —
  * bad magic, dimensions not multiples of 16, pixel budget above
  * [[Jpeg.MaxDecodePixels]], unknown frame types, out-of-bounds
  * motion vectors (the encoder contract keeps 16·b + mv inside the
  * frame; the decoder REJECTS rather than clamps, so there is exactly
  * one arithmetic for the oracle to replay), and truncation anywhere.
  *
  * Scale: like the other codecs, decode is partition-local over an
  * opaque binary column — frames never shuffle; operators emit
  * per-frame scalars.
  */
object Mpv {

  final case class Video(width: Int, height: Int,
      /** Reconstructed luma planes, row-major, one per frame. */
      frames: IndexedSeq[Array[Int]],
      /** Frame types, 'I' or 'P', parallel to `frames`. */
      types: IndexedSeq[Char],
      /** Per P-frame motion vectors by macroblock raster index;
        * empty array for I-frames. */
      motion: IndexedSeq[Array[(Int, Int)]])

  /** Encode `frames` (row-major luma, values 0..255) closed-loop:
    * frame 0 as I, the rest as P predicted from the encoder's own
    * reconstruction with the caller's per-macroblock motion vectors
    * (`mvs(k)` addresses frame k+1; motion SEARCH is an encoder
    * optimization, not part of the codec contract — synthesis callers
    * know their motion). MVs must keep the source block in bounds. */
  def encode(frames: Seq[Array[Int]], w: Int, h: Int,
      mvs: Seq[Array[(Int, Int)]],
      quant: Array[Int] = Jpeg.StdQuantLuma): Array[Byte] = {
    require(w > 0 && h > 0 && w % 16 == 0 && h % 16 == 0,
      s"dimensions must be positive multiples of 16, got ${w}x$h")
    require(frames.nonEmpty && frames.forall(_.length == w * h))
    require(mvs.length == frames.length - 1)
    val mbx = w / 16
    val mby = h / 16
    require(mvs.forall(_.length == mbx * mby))
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def i16(v: Int): Unit = u16(v & 0xffff)
    out.write('G'); out.write('M'); out.write('V'); out.write('1')
    u16(w); u16(h); u16(frames.length)

    def block(src: Array[Int], x0: Int, y0: Int): Array[Int] =
      Array.tabulate(64)(i => src((y0 + i / 8) * w + x0 + i % 8))

    // I-frame
    out.write('I')
    val recon = new Array[Int](w * h)
    for (by <- 0 until h by 8; bx <- 0 until w by 8) {
      val coefs = Jpeg.fdctQuant(block(frames.head, bx, by), quant)
      coefs.foreach(i16)
      val px = Jpeg.dequantIdct(coefs, quant)
      var i = 0
      while (i < 64) { recon((by + i / 8) * w + bx + i % 8) = px(i); i += 1 }
    }

    var prev = recon
    for (k <- 1 until frames.length) {
      out.write('P')
      val cur = new Array[Int](w * h)
      val target = frames(k)
      for (mb <- 0 until mbx * mby) {
        val mx = (mb % mbx) * 16
        val my = (mb / mbx) * 16
        val (dx, dy) = mvs(k - 1)(mb)
        val sx = mx + dx
        val sy = my + dy
        require(sx >= 0 && sy >= 0 && sx + 16 <= w && sy + 16 <= h,
          s"motion vector ($dx,$dy) at macroblock $mb leaves the frame")
        out.write(dx & 0xff); out.write(dy & 0xff)
        for (sub <- 0 until 4) {
          val ox = mx + (sub % 2) * 8
          val oy = my + (sub / 2) * 8
          // residual vs the RECONSTRUCTED previous frame, clamped to
          // the coded range and carried as sample r + 128
          val res = Array.tabulate(64) { i =>
            val x = ox + i % 8
            val y = oy + i / 8
            val pred = prev((y + dy) * w + (x + dx))
            val r = target(y * w + x) - pred
            (if (r < -128) -128 else if (r > 127) 127 else r) + 128
          }
          val coefs = Jpeg.fdctQuant(res, quant)
          coefs.foreach(i16)
          val rpx = Jpeg.dequantIdct(coefs, quant)
          var i = 0
          while (i < 64) {
            val x = ox + i % 8
            val y = oy + i / 8
            val pred = prev((y + dy) * w + (x + dx))
            val p = pred + rpx(i) - 128
            cur(y * w + x) = if (p < 0) 0 else if (p > 255) 255 else p
            i += 1
          }
        }
      }
      prev = cur
    }
    out.toByteArray
  }

  /** Total decode: None on any malformation (see scaladoc). */
  def decode(bytes: Array[Byte],
      quant: Array[Int] = Jpeg.StdQuantLuma): Option[Video] = {
    if (bytes == null || bytes.length < 10) return None
    if (bytes(0) != 'G' || bytes(1) != 'M' || bytes(2) != 'V' ||
        bytes(3) != '1') return None
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val w = u16(4)
    val h = u16(6)
    val nf = u16(8)
    if (w == 0 || h == 0 || w % 16 != 0 || h % 16 != 0 || nf == 0)
      return None
    if (w.toLong * h > Jpeg.MaxDecodePixels) return None
    val mbx = w / 16
    val mby = h / 16
    var p = 10
    def i16(): Int = {
      val v = ((bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)).toShort
      p += 2
      v.toInt
    }
    val frames = IndexedSeq.newBuilder[Array[Int]]
    val types = IndexedSeq.newBuilder[Char]
    val motion = IndexedSeq.newBuilder[Array[(Int, Int)]]
    var prev: Array[Int] = null
    val coefs = new Array[Int](64)
    var k = 0
    while (k < nf) {
      if (p >= bytes.length) return None
      val ft = bytes(p) & 0xff
      p += 1
      if (ft == 'I') {
        if (p + (w / 8) * (h / 8) * 128 > bytes.length) return None
        val cur = new Array[Int](w * h)
        for (by <- 0 until h by 8; bx <- 0 until w by 8) {
          var i = 0
          while (i < 64) { coefs(i) = i16(); i += 1 }
          val px = Jpeg.dequantIdct(coefs, quant)
          i = 0
          while (i < 64) {
            cur((by + i / 8) * w + bx + i % 8) = px(i); i += 1
          }
        }
        frames += cur; types += 'I'; motion += Array.empty
        prev = cur
      } else if (ft == 'P') {
        if (prev == null) return None // P before any reference
        if (p + mbx * mby * (2 + 4 * 128) > bytes.length) return None
        val cur = new Array[Int](w * h)
        val mvs = new Array[(Int, Int)](mbx * mby)
        for (mb <- 0 until mbx * mby) {
          val mx = (mb % mbx) * 16
          val my = (mb / mbx) * 16
          val dx = bytes(p).toInt
          val dy = bytes(p + 1).toInt
          p += 2
          if (mx + dx < 0 || my + dy < 0 || mx + dx + 16 > w ||
              my + dy + 16 > h) return None
          mvs(mb) = (dx, dy)
          for (sub <- 0 until 4) {
            val ox = mx + (sub % 2) * 8
            val oy = my + (sub / 2) * 8
            var i = 0
            while (i < 64) { coefs(i) = i16(); i += 1 }
            val rpx = Jpeg.dequantIdct(coefs, quant)
            i = 0
            while (i < 64) {
              val x = ox + i % 8
              val y = oy + i / 8
              val pred = prev((y + dy) * w + (x + dx))
              val v = pred + rpx(i) - 128
              cur(y * w + x) = if (v < 0) 0 else if (v > 255) 255 else v
              i += 1
            }
          }
        }
        frames += cur; types += 'P'; motion += mvs
        prev = cur
      } else return None
      k += 1
    }
    Some(Video(w, h, frames.result(), types.result(), motion.result()))
  }

  /** Per-frame curation signals off a decoded video: (frame index,
    * type, mean luma ×10⁶ floored, mean |mv| ×10⁶ floored, residual
    * energy proxy = mean |frame − MC(prev)| ×10⁶ for P-frames, 0 for
    * I) — integer-scaled so the values are exactly replayable. */
  def frameSignals(v: Video): IndexedSeq[(Int, String, Long, Long, Long)] =
    v.frames.indices.map { k =>
      val f = v.frames(k)
      val mean = f.map(_.toLong).sum * 1000000L / f.length
      val (mvMag, resEnergy) =
        if (v.types(k) == 'I') (0L, 0L)
        else {
          val mvs = v.motion(k)
          val mag = mvs.map { case (dx, dy) =>
            (math.abs(dx) + math.abs(dy)).toLong
          }.sum * 1000000L / mvs.length
          val prev = v.frames(k - 1)
          val mbxN = v.width / 16
          var acc = 0L
          var mb = 0
          while (mb < mvs.length) {
            val mx = (mb % mbxN) * 16
            val my = (mb / mbxN) * 16
            val (dx, dy) = mvs(mb)
            var j = 0
            while (j < 256) {
              val x = mx + j % 16
              val y = my + j / 16
              acc += math.abs(f(y * v.width + x) -
                prev((y + dy) * v.width + (x + dx)))
              j += 1
            }
            mb += 1
          }
          (mag, acc * 1000000L / f.length)
        }
      (k, v.types(k).toString, mean, mvMag, resEnergy)
    }
}
