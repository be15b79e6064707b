package graft.multimodal

/** FLAC (Free Lossless Audio Codec) — a real decoder for the third
  * compressed-audio family, and the first with an actual
  * entropy-coded bitstream (t74's G.711 is a table lookup, t82's IMA
  * ADPCM a fixed-step recursion; FLAC carries Rice-coded prediction
  * residuals at frame-chosen parameters).
  *
  * Implemented from the public format specification (RFC 9639 / the
  * xiph.org FLAC format document), first principles only:
  *
  *  - stream = "fLaC" magic, metadata blocks (STREAMINFO required),
  *    then self-delimiting frames;
  *  - frame = 14-bit sync + header (block size / rate / channel /
  *    sample-size codes, UTF-8-coded frame number, CRC-8) + one
  *    subframe per channel + byte-align + CRC-16 over the whole frame;
  *  - subframe = CONSTANT | VERBATIM | FIXED(order 0..4) |
  *    LPC(order 1..32), with the wasted-bits shift;
  *  - residual = partitioned Rice, 4- or 5-bit parameters, escape
  *    partitions raw.
  *
  * Scope declared honestly: MONO streams only (the corpus media
  * columns carry mono features; stereo decorrelation modes are
  * rejected loudly, not mis-decoded). Every integrity feature is
  * enforced, not skipped: header CRC-8, frame CRC-16, and the
  * STREAMINFO MD5 of the decoded stream must all verify — a flipped
  * bit anywhere fails the decode loudly (CodecFuzzSpec corrupts
  * streams to prove it).
  *
  * The JDK has no FLAC provider (spec-asserted), so unlike WAV/AIFF
  * both the container walk and the bitstream decode here are ours.
  * [[encode]] is the synthesis half (fixed predictors with per-block
  * order selection, Rice parameter search, escape fallback): lossless
  * by construction, so gates can pin decoded samples to exact
  * arithmetic an external engine replays (the t86 oracle pattern).
  */
object Flac {

  /** CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — the FLAC frame
    * header checksum. */
  private[multimodal] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — the FLAC
    * whole-frame checksum. */
  private[multimodal] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------------
  // bit I/O
  // ------------------------------------------------------------------

  private final class BitReader(bytes: Array[Byte], var bytePos: Int) {
    private var bitPos = 0 // 0..7, MSB first

    def position: Int = bytePos

    def atByteBoundary: Boolean = bitPos == 0

    def alignToByte(): Unit =
      if (bitPos != 0) { bitPos = 0; bytePos += 1 }

    def readBit(): Int = {
      require(bytePos < bytes.length, "truncated FLAC stream")
      val v = (bytes(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }

    /** Up to 32 bits, MSB first, unsigned in a Long. */
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    /** n-bit two's-complement signed read. */
    def readSigned(n: Int): Int = {
      val u = readBits(n)
      if (n > 0 && (u & (1L << (n - 1))) != 0) (u - (1L << n)).toInt
      else u.toInt
    }

    /** FLAC unary: count 0 bits up to the terminating 1. */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        require(q <= (bytes.length.toLong * 8),
          "runaway unary run in FLAC stream")
      }
      q
    }
  }

  private final class BitWriter {
    private val out = new scala.collection.mutable.ArrayBuilder.ofByte
    private var cur = 0
    private var nbits = 0
    private var len = 0

    def lengthBytes: Int = len

    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nbits += 1
      if (nbits == 8) { out += cur.toByte; len += 1; cur = 0; nbits = 0 }
    }

    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >> i) & 1L).toInt); i -= 1 }
    }

    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }

    def alignToByte(): Unit = while (nbits != 0) writeBit(0)

    def result(): Array[Byte] = { require(nbits == 0, "unaligned"); out.result() }
  }

  // ------------------------------------------------------------------
  // encode (synthesis half)
  // ------------------------------------------------------------------

  private def zigzag(v: Int): Long = ((v.toLong << 1) ^ (v.toLong >> 63))

  private def fixedResiduals(s: Array[Int], from: Int, until: Int,
      order: Int): Array[Int] = {
    val n = until - from
    val r = new Array[Int](n - order)
    var i = from + order
    while (i < until) {
      val v = order match {
        case 0 => s(i)
        case 1 => s(i) - s(i - 1)
        case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
        case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
        case 4 => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4)
      }
      r(i - from - order) = v
      i += 1
    }
    r
  }

  /** Cheapest Rice parameter for a residual partition: cost(p) =
    * n·(p+1) + Σ(zigzag>>p); returns (param, cost) with 15 = escape
    * (raw 17-bit) when that wins — a fixed-order residual of 16-bit
    * input is bounded by 2^20, so escapes carry rawBits below. */
  private val EscapeRawBits = 21

  private def bestRice(res: Array[Int]): (Int, Long) = {
    var bestP = 0
    var bestCost = Long.MaxValue
    var p = 0
    while (p <= 14) {
      var cost = res.length.toLong * (p + 1)
      var i = 0
      while (i < res.length) { cost += zigzag(res(i)) >>> p; i += 1 }
      if (cost < bestCost) { bestCost = cost; bestP = p }
      p += 1
    }
    val escCost = 5L + res.length.toLong * EscapeRawBits
    if (escCost < bestCost) (15, escCost) else (bestP, bestCost)
  }

  private def utf8FrameNumber(w: BitWriter, n: Long): Unit = {
    // the UTF-8-style variable-length coding the frame header uses
    if (n < 0x80) w.writeBits(n, 8)
    else {
      // payload capacity with c continuation bytes: (6-c) + 6c = 6+5c bits
      var cont = 1
      while (n >= (1L << (6 + 5 * cont))) cont += 1
      // header byte: cont+1 leading ones, then a zero
      val headerPayloadBits = 6 - cont
      var mask = 0
      var i = 0
      while (i < cont + 1) { mask = (mask << 1) | 1; i += 1 }
      w.writeBits(mask.toLong, cont + 1)
      w.writeBit(0)
      w.writeBits(n >> (6 * cont), headerPayloadBits)
      var c = cont - 1
      while (c >= 0) {
        w.writeBits(0x2L, 2) // 10
        w.writeBits((n >> (6 * c)) & 0x3f, 6)
        c -= 1
      }
    }
  }

  /** Encode mono 16-bit samples as a FLAC stream: STREAMINFO with a
    * real MD5 of the sample stream, then fixed-blocksize frames, each
    * subframe the cheapest of CONSTANT / FIXED(0..4) with a searched
    * Rice parameter (escape partitions when entropy coding loses).
    * Lossless: decode(encode(x)) == x bit-for-bit, spec-asserted. */
  def encode(samples: Array[Short], sampleRate: Int,
      blockSize: Int = 4096): Array[Byte] = {
    require(samples.nonEmpty, "empty sample stream")
    require(blockSize >= 16 && blockSize <= 65535, s"bad blockSize $blockSize")
    require(sampleRate > 0 && sampleRate < (1 << 20), s"bad sampleRate $sampleRate")
    val md = java.security.MessageDigest.getInstance("MD5")
    val le = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      le(2 * i) = (samples(i) & 0xff).toByte
      le(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val md5 = md.digest(le)

    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO, last-metadata flag set
    val si = new BitWriter
    si.writeBits(blockSize.toLong, 16) // min block size
    si.writeBits(blockSize.toLong, 16) // max block size
    si.writeBits(0L, 24) // min frame size unknown
    si.writeBits(0L, 24) // max frame size unknown
    si.writeBits(sampleRate.toLong, 20)
    si.writeBits(0L, 3) // channels - 1 = 0 (mono)
    si.writeBits(15L, 5) // bits per sample - 1
    si.writeBits(samples.length.toLong, 36)
    val siBytes = si.result()
    out.write(0x80) // last-block flag | type 0 (STREAMINFO)
    out.write(0); out.write(0); out.write(34)
    out.write(siBytes)
    out.write(md5)

    var frameNo = 0L
    var off = 0
    while (off < samples.length) {
      val n = math.min(blockSize, samples.length - off)
      val w = new BitWriter
      // frame header
      w.writeBits(0x3ffeL, 14) // sync
      w.writeBit(0) // reserved
      w.writeBit(0) // fixed-blocksize strategy
      w.writeBits(0x7L, 4) // block size: 16-bit value - 1 at header end
      w.writeBits(0x0L, 4) // sample rate: from STREAMINFO
      w.writeBits(0x0L, 4) // channel assignment: mono
      w.writeBits(0x4L, 3) // sample size: 16 bits
      w.writeBit(0) // reserved
      utf8FrameNumber(w, frameNo)
      w.writeBits((n - 1).toLong, 16)
      val headerNoCrc = { w.alignToByte(); w.result() }
      // restart a writer carrying the header so CRCs cover real bytes
      val fw = new java.io.ByteArrayOutputStream()
      fw.write(headerNoCrc)
      fw.write(crc8(headerNoCrc, 0, headerNoCrc.length))

      // subframe: pick cheapest of constant / fixed orders
      val s = new Array[Int](n)
      var k = 0
      while (k < n) { s(k) = samples(off + k).toInt; k += 1 }
      val sw = new BitWriter
      var constant = true
      k = 1
      while (constant && k < n) { constant = s(k) == s(0); k += 1 }
      if (constant) {
        sw.writeBit(0)
        sw.writeBits(0L, 6) // CONSTANT
        sw.writeBit(0) // no wasted bits
        sw.writeBits((s(0).toLong & 0xffff), 16)
      } else {
        val maxOrder = math.min(4, n - 1)
        var bestOrder = 0
        var bestParam = 0
        var bestCost = Long.MaxValue
        var bestRes: Array[Int] = null
        var o = 0
        while (o <= maxOrder) {
          val res = fixedResiduals(s, 0, n, o)
          val (p, c) = bestRice(res)
          val total = c + o.toLong * 16
          if (total < bestCost) {
            bestCost = total; bestOrder = o; bestParam = p; bestRes = res
          }
          o += 1
        }
        sw.writeBit(0)
        sw.writeBits((8 + bestOrder).toLong, 6) // FIXED order
        sw.writeBit(0) // no wasted bits
        k = 0
        while (k < bestOrder) {
          sw.writeBits((s(k).toLong & 0xffff), 16); k += 1
        }
        // residual: method 0 (4-bit rice), partition order 0
        sw.writeBits(0L, 2)
        sw.writeBits(0L, 4)
        sw.writeBits(bestParam.toLong, 4)
        if (bestParam == 15) {
          sw.writeBits(EscapeRawBits.toLong, 5)
          k = 0
          while (k < bestRes.length) {
            sw.writeBits(bestRes(k).toLong & ((1L << EscapeRawBits) - 1),
              EscapeRawBits)
            k += 1
          }
        } else {
          k = 0
          while (k < bestRes.length) {
            val u = zigzag(bestRes(k))
            sw.writeUnary((u >>> bestParam).toInt)
            sw.writeBits(u & ((1L << bestParam) - 1), bestParam)
            k += 1
          }
        }
      }
      sw.alignToByte()
      fw.write(sw.result())
      val frameBytes = fw.toByteArray
      val c16 = crc16(frameBytes, 0, frameBytes.length)
      out.write(frameBytes)
      out.write((c16 >> 8) & 0xff)
      out.write(c16 & 0xff)
      off += n
      frameNo += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  def isFlac(bytes: Array[Byte]): Boolean =
    bytes.length > 42 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C'

  private val RateTable: Array[Int] = Array(
    -1, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
    32000, 44100, 48000, 96000, -2, -3, -4, -5)

  private val SizeTable: Array[Int] = Array(-1, 8, 12, -1, 16, 20, 24, 32)

  /** Decode a mono FLAC stream to (sampleRate, samples normalized as
    * k / 2^(bits-1)). Header CRC-8, frame CRC-16, and STREAMINFO MD5
    * (when present) are all verified; any mismatch or malformed
    * structure throws — torn media must fail loudly, not produce
    * plausible garbage. */
  def decode(bytes: Array[Byte]): (Float, Array[Float]) = {
    require(isFlac(bytes), "not a FLAC stream")
    var pos = 4
    // metadata blocks
    var last = false
    var srate = 0
    var channels = 0
    var bps = 0
    var totalSamples = 0L
    var md5: Array[Byte] = null
    var sawStreamInfo = false
    while (!last) {
      require(pos + 4 <= bytes.length, "truncated FLAC metadata")
      val h = bytes(pos) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val blen = ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      pos += 4
      require(pos + blen <= bytes.length, "truncated FLAC metadata block")
      if (btype == 0) {
        require(blen == 34, s"bad STREAMINFO length $blen")
        val r = new BitReader(bytes, pos)
        r.readBits(16); r.readBits(16) // min/max block size
        r.readBits(24); r.readBits(24) // min/max frame size
        srate = r.readBits(20).toInt
        channels = r.readBits(3).toInt + 1
        bps = r.readBits(5).toInt + 1
        totalSamples = r.readBits(36)
        md5 = java.util.Arrays.copyOfRange(bytes, pos + 18, pos + 34)
        sawStreamInfo = true
      }
      pos += blen
    }
    require(sawStreamInfo, "FLAC stream without STREAMINFO")
    require(channels == 1,
      s"unsupported FLAC channel count $channels (mono only)")
    require(srate > 0, s"bad FLAC sample rate $srate")

    val outSamples = new scala.collection.mutable.ArrayBuilder.ofInt
    var decoded = 0L
    while (pos < bytes.length &&
        (totalSamples == 0L || decoded < totalSamples)) {
      val frameStart = pos
      val r = new BitReader(bytes, pos)
      require(r.readBits(14) == 0x3ffeL, "lost FLAC frame sync")
      r.readBit() // reserved
      r.readBit() // blocking strategy
      val bsCode = r.readBits(4).toInt
      val srCode = r.readBits(4).toInt
      val chanAsg = r.readBits(4).toInt
      val ssCode = r.readBits(3).toInt
      r.readBit() // reserved
      require(chanAsg == 0,
        s"unsupported FLAC channel assignment $chanAsg (mono only)")
      // UTF-8-coded frame/sample number — validated, value unused
      val first = r.readBits(8).toInt
      if (first >= 0x80) {
        var ones = 0
        var m = 0x80
        while ((first & m) != 0) { ones += 1; m >>= 1 }
        require(ones >= 2 && ones <= 7, "bad frame number coding")
        var c = 0
        while (c < ones - 1) {
          require((r.readBits(8).toInt & 0xc0) == 0x80,
            "bad frame number continuation")
          c += 1
        }
      }
      val blockSize = bsCode match {
        case 0 => throw new IllegalArgumentException("reserved block size code")
        case 1 => 192
        case n if n >= 2 && n <= 5 => 576 << (n - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case n => 256 << (n - 8)
      }
      srCode match {
        case 0 => () // from STREAMINFO
        case 12 => r.readBits(8)
        case 13 | 14 => r.readBits(16)
        case 15 => throw new IllegalArgumentException("invalid sample rate code")
        case n => require(RateTable(n) > 0, "bad rate code")
      }
      val frameBps = ssCode match {
        case 0 => bps
        case 3 | 7 => throw new IllegalArgumentException("reserved sample size code")
        case n => SizeTable(n)
      }
      require(frameBps == bps,
        s"frame sample size $frameBps != STREAMINFO $bps")
      r.alignToByte()
      val headerEnd = r.position
      require(headerEnd < bytes.length, "truncated FLAC frame header")
      val wantCrc8 = bytes(headerEnd) & 0xff
      require(crc8(bytes, frameStart, headerEnd) == wantCrc8,
        "FLAC frame header CRC-8 mismatch")
      val body = new BitReader(bytes, headerEnd + 1)

      // one subframe (mono)
      require(body.readBit() == 0, "bad subframe padding bit")
      val sfType = body.readBits(6).toInt
      val wasted =
        if (body.readBit() == 1) body.readUnary() + 1 else 0
      val effBps = bps - wasted
      require(effBps > 0, "wasted bits exhaust sample size")
      val s = new Array[Int](blockSize)
      sfType match {
        case 0 => // CONSTANT
          val v = body.readSigned(effBps)
          java.util.Arrays.fill(s, v)
        case 1 => // VERBATIM
          var i = 0
          while (i < blockSize) { s(i) = body.readSigned(effBps); i += 1 }
        case t if t >= 8 && t <= 12 => // FIXED
          val order = t - 8
          var i = 0
          while (i < order) { s(i) = body.readSigned(effBps); i += 1 }
          readResiduals(body, s, order, blockSize)
          i = order
          while (i < blockSize) {
            val p = order match {
              case 0 => 0L
              case 1 => s(i - 1).toLong
              case 2 => 2L * s(i - 1) - s(i - 2)
              case 3 => 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
              case 4 => 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) - s(i - 4)
            }
            s(i) = (p + s(i)).toInt
            i += 1
          }
        case t if t >= 32 => // LPC, order = (t & 31) + 1
          val order = (t & 31) + 1
          var i = 0
          while (i < order) { s(i) = body.readSigned(effBps); i += 1 }
          val precision = body.readBits(4).toInt + 1
          require(precision != 16, "invalid LPC precision code")
          val shift = body.readSigned(5)
          require(shift >= 0, s"negative LPC shift $shift")
          val coef = new Array[Int](order)
          i = 0
          while (i < order) { coef(i) = body.readSigned(precision); i += 1 }
          readResiduals(body, s, order, blockSize)
          i = order
          while (i < blockSize) {
            var acc = 0L
            var j = 0
            while (j < order) { acc += coef(j).toLong * s(i - 1 - j); j += 1 }
            s(i) = ((acc >> shift) + s(i)).toInt
            i += 1
          }
        case t =>
          throw new IllegalArgumentException(s"reserved subframe type $t")
      }
      if (wasted > 0) {
        var i = 0
        while (i < blockSize) { s(i) = s(i) << wasted; i += 1 }
      }

      body.alignToByte()
      val footerPos = body.position
      require(footerPos + 2 <= bytes.length, "truncated FLAC frame footer")
      val wantCrc16 = ((bytes(footerPos) & 0xff) << 8) |
        (bytes(footerPos + 1) & 0xff)
      require(crc16(bytes, frameStart, footerPos) == wantCrc16,
        "FLAC frame CRC-16 mismatch")
      pos = footerPos + 2

      val keep =
        if (totalSamples > 0L)
          math.min(blockSize.toLong, totalSamples - decoded).toInt
        else blockSize
      var i = 0
      while (i < keep) { outSamples += s(i); i += 1 }
      decoded += keep
    }
    require(totalSamples == 0L || decoded == totalSamples,
      s"FLAC stream ended at $decoded of $totalSamples samples")

    val ints = outSamples.result()
    // verify the STREAMINFO MD5 of the decoded stream (16-bit LE, the
    // layout the spec defines for the unencoded data) when present
    if (bps == 16 && md5 != null && md5.exists(_ != 0)) {
      val le = new Array[Byte](ints.length * 2)
      var i = 0
      while (i < ints.length) {
        le(2 * i) = (ints(i) & 0xff).toByte
        le(2 * i + 1) = ((ints(i) >> 8) & 0xff).toByte
        i += 1
      }
      val got = java.security.MessageDigest.getInstance("MD5").digest(le)
      require(java.util.Arrays.equals(got, md5),
        "FLAC decoded-stream MD5 mismatch")
    }
    val scale = (1L << (bps - 1)).toDouble
    val out = new Array[Float](ints.length)
    var i = 0
    while (i < ints.length) { out(i) = (ints(i) / scale).toFloat; i += 1 }
    (srate.toFloat, out)
  }

  /** Partitioned-Rice residual section into s(order until blockSize). */
  private def readResiduals(r: BitReader, s: Array[Int], order: Int,
      blockSize: Int): Unit = {
    val method = r.readBits(2).toInt
    require(method == 0 || method == 1,
      s"reserved residual coding method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val po = r.readBits(4).toInt
    val partitions = 1 << po
    require(blockSize % partitions == 0,
      s"block size $blockSize not divisible into $partitions partitions")
    require(blockSize / partitions > order || po == 0,
      "partition shorter than predictor order")
    var idx = order
    var part = 0
    while (part < partitions) {
      val count =
        if (po == 0) blockSize - order
        else if (part == 0) blockSize / partitions - order
        else blockSize / partitions
      val param = r.readBits(paramBits).toInt
      if (param == escape) {
        val rawBits = r.readBits(5).toInt
        var i = 0
        while (i < count) {
          s(idx) = if (rawBits == 0) 0 else r.readSigned(rawBits)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary()
          val u = (q.toLong << param) | r.readBits(param)
          s(idx) = ((u >>> 1) ^ -(u & 1L)).toInt
          idx += 1; i += 1
        }
      }
      part += 1
    }
  }
  // ------------------------------------------------------------------
  // VORBIS_COMMENT metadata (block type 4) — the lossless family's
  // ID3v2: TITLE/ARTIST/DATE/... fields media curation reads as dedup
  // keys and source attribution, O(1) per object (the block sits
  // before any audio frame). Clean-room from the public FLAC format
  // spec (metadata block framing) + the Vorbis comment header spec
  // (little-endian length-prefixed UTF-8 "FIELD=value" strings).
  // ------------------------------------------------------------------

  /** One decoded comment field: `offset` is the byte offset of the
    * field's 4-byte length prefix within the stream, `field` the name
    * uppercased (the spec makes names case-insensitive ASCII), `value`
    * the UTF-8 value (may itself contain '=' — only the FIRST '='
    * splits). */
  final case class VorbisField(offset: Int, field: String, value: String)

  /** Parsed VORBIS_COMMENT block: encoder vendor string + fields in
    * stored order. */
  final case class VorbisComments(vendor: String, fields: Seq[VorbisField])

  /** Decode the first VORBIS_COMMENT block of a FLAC stream. None when
    * the stream has no such block or the block is malformed/truncated
    * (never throws — the CodecFuzzSpec totality contract). The walk
    * strides non-comment blocks by their declared size, exactly like
    * [[decode]]'s metadata loop. */
  def vorbisComments(bytes: Array[Byte]): Option[VorbisComments] = {
    if (!isFlac(bytes)) return None
    var pos = 4
    var last = false
    while (!last) {
      if (pos + 4 > bytes.length) return None
      val h = bytes(pos) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val blen = ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      pos += 4
      if (pos + blen > bytes.length) return None
      if (btype == 4) {
        val end = pos + blen
        var p = pos
        def le32(at: Int): Long =
          ((bytes(at) & 0xffL)) | ((bytes(at + 1) & 0xffL) << 8) |
            ((bytes(at + 2) & 0xffL) << 16) | ((bytes(at + 3) & 0xffL) << 24)
        if (p + 4 > end) return None
        val vlen = le32(p); p += 4
        if (vlen > end - p) return None
        val vendor = new String(bytes, p, vlen.toInt, "UTF-8")
        p += vlen.toInt
        if (p + 4 > end) return None
        val n = le32(p); p += 4
        val out = Seq.newBuilder[VorbisField]
        var i = 0L
        while (i < n) {
          if (p + 4 > end) return None
          val flen = le32(p)
          if (flen > end - p - 4) return None
          val s = new String(bytes, p + 4, flen.toInt, "UTF-8")
          val eq = s.indexOf('=')
          if (eq > 0) out += VorbisField(p,
            s.substring(0, eq).toUpperCase(java.util.Locale.ROOT),
            s.substring(eq + 1))
          p += 4 + flen.toInt
          i += 1
        }
        return Some(VorbisComments(vendor, out.result()))
      }
      pos += blen
    }
    None
  }

  /** Raw VORBIS_COMMENT block payload (no 4-byte block header):
    * LE-32 vendor length + vendor, LE-32 field count, then LE-32
    * length + "FIELD=value" per field — the exact arithmetic the t131
    * oracle rederives offset by offset. */
  private def vorbisCommentPayload(vendor: String,
      fields: Seq[(String, String)]): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      bb.write(v & 0xff); bb.write((v >> 8) & 0xff)
      bb.write((v >> 16) & 0xff); bb.write((v >> 24) & 0xff)
    }
    val vb = vendor.getBytes("UTF-8")
    le32(vb.length); bb.write(vb)
    le32(fields.length)
    fields.foreach { case (k, v) =>
      require(k.nonEmpty && !k.contains('=') &&
        k.forall(c => c >= 0x20 && c <= 0x7d),
        s"invalid Vorbis field name: $k")
      val fb = s"$k=$v".getBytes("UTF-8")
      le32(fb.length); bb.write(fb)
    }
    bb.toByteArray
  }

  /** Insert a VORBIS_COMMENT block right after STREAMINFO in an
    * existing FLAC stream (e.g. [[encode]]'s output): STREAMINFO's
    * last-metadata flag moves to the inserted block, audio frames are
    * untouched, and [[decode]] strides over the new block unchanged
    * (spec-asserted). */
  def withVorbisComments(flac: Array[Byte], vendor: String,
      fields: Seq[(String, String)]): Array[Byte] = {
    require(isFlac(flac), "not a FLAC stream")
    require(flac.length >= 8, "truncated FLAC stream")
    val h = flac(4) & 0xff
    val wasLast = (h & 0x80) != 0
    val silen = ((flac(5) & 0xff) << 16) | ((flac(6) & 0xff) << 8) |
      (flac(7) & 0xff)
    val insertAt = 8 + silen
    require(insertAt <= flac.length, "truncated STREAMINFO")
    val payload = vorbisCommentPayload(vendor, fields)
    require(payload.length < (1 << 24), "comment block too large")
    val out = new java.io.ByteArrayOutputStream()
    out.write(flac, 0, 4)
    out.write(h & 0x7f) // STREAMINFO: clear last-metadata flag
    out.write(flac, 5, insertAt - 5)
    out.write((if (wasLast) 0x80 else 0x00) | 4) // type 4, inherited flag
    out.write((payload.length >> 16) & 0xff)
    out.write((payload.length >> 8) & 0xff)
    out.write(payload.length & 0xff)
    out.write(payload)
    out.write(flac, insertAt, flac.length - insertAt)
    out.toByteArray
  }
}
