package graft.multimodal

/** MPEG-1 audio FRAME layer — the metadata walk a corpus pipeline
  * runs over compressed audio at scale: sync scan, header parse,
  * frame-size accounting, CBR/VBR detection, duration math, torn-tail
  * robustness. Everything here is closed-form header arithmetic
  * (public ISO/IEC 11172-3 frame syntax), so the t127 gate has DuckDB
  * rederive every parsed fact from the same integer formulas.
  *
  * DELIBERATE BOUNDARY — parse, not PCM decode. Full Layer I–III
  * synthesis requires the spec's table data (the 512-tap synthesis
  * window, Layer III Huffman code tables): embedding reconstructions
  * of those from memory in a clean-room build would ship unverifiable
  * numbers (no reference decoder exists in this environment to check
  * against), which is worse than the honest gap. At 100 TB the parse
  * layer is what the DISTRIBUTED engine needs anyway — duration/
  * bitrate/integrity stats for curation, sharding and dedup routing
  * run on headers alone; sample-exact decode belongs in the dedicated
  * media-decode stage alongside the GPU transforms, exactly where the
  * pipeline already stubs non-JVM codecs. PCM-exact decode IS
  * implemented for the lossless/telephony family (WAV/AIFF/AU PCM,
  * G.711, ADPCM, FLAC — [[Multimodal.AudioDecoder]], [[Flac]]).
  *
  * Supported: MPEG-1 (version bits 11) Layers I/II/III, CRC and
  * padding flags, all bitrate/sample-rate indexes, ID3v2 prefix skip,
  * mid-stream resync after garbage. Free-format (bitrate index 0)
  * frames are rejected at parse (size is not derivable from the
  * header alone); MPEG-2/2.5 headers simply fail validation and are
  * skipped by the resync scan.
  */
object Mp3 {

  /** MPEG-1 bitrates in kbps by (layer, index 1..14); index 0 is
    * free-format, 15 is invalid. Layer here is the DECODED layer
    * number (1, 2, 3), not the inverted 2-bit header field. */
  private[graft] val BitrateKbps: Map[Int, Array[Int]] = Map(
    1 -> Array(0, 32, 64, 96, 128, 160, 192, 224,
      256, 288, 320, 352, 384, 416, 448),
    2 -> Array(0, 32, 48, 56, 64, 80, 96, 112,
      128, 160, 192, 224, 256, 320, 384),
    3 -> Array(0, 32, 40, 48, 56, 64, 80, 96,
      112, 128, 160, 192, 224, 256, 320))

  /** MPEG-1 sample rates by 2-bit header index; index 3 is invalid. */
  private[graft] val SampleRate: Array[Int] =
    Array(44100, 48000, 32000)

  /** One parsed frame header. `sizeBytes` covers the whole frame
    * (header + optional CRC + payload) — the walker's stride. */
  final case class FrameInfo(
      offset: Int,
      sizeBytes: Int,
      layer: Int,
      bitrateKbps: Int,
      sampleRate: Int,
      padding: Boolean,
      crc: Boolean,
      channels: Int,
      samplesPerFrame: Int)

  /** Whole-stream summary: what curation reads per object. `cbr` is
    * true when every frame carries one bitrate; `bitrateKbps` is that
    * bitrate for CBR and the frame-weighted integer mean for VBR
    * (floor — deterministic, oracle-replayable). `durationMs` =
    * totalSamples · 1000 / sampleRate in Long math. */
  final case class StreamInfo(
      nFrames: Int,
      layer: Int,
      sampleRate: Int,
      channels: Int,
      cbr: Boolean,
      bitrateKbps: Int,
      nPadded: Int,
      totalSamples: Long,
      durationMs: Long,
      bytesParsed: Long)

  /** Frame size in bytes from header fields — the ISO formula:
    * Layer I: (12·bitrate/rate + padding)·4 slots of 4 bytes;
    * Layers II/III (MPEG-1): 144·bitrate/rate + padding. Integer
    * (floor) division, bitrate in bits/s. */
  private[multimodal] def frameSize(layer: Int, bitrateKbps: Int,
      sampleRate: Int, padding: Boolean): Int = {
    val br = bitrateKbps * 1000
    val pad = if (padding) 1 else 0
    if (layer == 1) (12 * br / sampleRate + pad) * 4
    else 144 * br / sampleRate + pad
  }

  /** Parse + VALIDATE the 4-byte header at `off`; None when anything
    * disqualifies it (not a sync, reserved index, free format, or the
    * frame would run past the buffer — the torn-tail case). */
  def parseHeaderAt(bytes: Array[Byte], off: Int): Option[FrameInfo] = {
    if (off + 4 > bytes.length) return None
    val b0 = bytes(off) & 0xff
    val b1 = bytes(off + 1) & 0xff
    val b2 = bytes(off + 2) & 0xff
    val b3 = bytes(off + 3) & 0xff
    if (b0 != 0xff || (b1 & 0xe0) != 0xe0) return None
    if ((b1 & 0x18) != 0x18) return None // MPEG-1 only (version bits 11)
    val layerBits = (b1 >> 1) & 0x3
    if (layerBits == 0) return None // reserved
    val layer = 4 - layerBits // 01→III, 10→II, 11→I
    val crc = (b1 & 0x1) == 0 // protection bit 0 = CRC-16 present
    val brIdx = (b2 >> 4) & 0xf
    if (brIdx == 0 || brIdx == 15) return None // free format / invalid
    val srIdx = (b2 >> 2) & 0x3
    if (srIdx == 3) return None
    val padding = ((b2 >> 1) & 0x1) == 1
    val mode = (b3 >> 6) & 0x3
    val channels = if (mode == 3) 1 else 2
    val bitrate = BitrateKbps(layer)(brIdx)
    val rate = SampleRate(srIdx)
    val size = frameSize(layer, bitrate, rate, padding)
    if (off + size > bytes.length) return None // torn tail
    Some(FrameInfo(off, size, layer, bitrate, rate, padding, crc,
      channels, if (layer == 1) 384 else 1152))
  }

  /** Bytes to skip for an ID3v2 prefix at offset 0 (header 10 bytes +
    * syncsafe 28-bit size), or 0 when absent. */
  private[multimodal] def id3v2Size(bytes: Array[Byte]): Int = {
    if (bytes.length < 10 || bytes(0) != 'I' || bytes(1) != 'D' ||
      bytes(2) != '3') return 0
    val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
      ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
    10 + sz
  }

  /** True when the payload starts (after any ID3v2 prefix) with a
    * valid MPEG-1 frame — the dispatch predicate. */
  def isMp3(bytes: Array[Byte]): Boolean = {
    val start = math.min(id3v2Size(bytes), bytes.length)
    parseHeaderAt(bytes, start).isDefined
  }

  /** Header-FIELD validity at the stream start (after any ID3v2
    * prefix) WITHOUT the frame-fits check — true for an MP3 whose
    * first frame is torn mid-payload, which [[isMp3]] deliberately
    * rejects. This is the ROUTING predicate: error paths use it so a
    * truncated MPEG object still gets the parse-only message instead
    * of an opaque downstream failure. */
  def looksLikeMpeg(bytes: Array[Byte]): Boolean = {
    val off = math.min(id3v2Size(bytes), bytes.length)
    if (off + 4 > bytes.length) return false
    val b1 = bytes(off + 1) & 0xff
    val b2 = bytes(off + 2) & 0xff
    (bytes(off) & 0xff) == 0xff && (b1 & 0xe0) == 0xe0 &&
      (b1 & 0x18) == 0x18 && ((b1 >> 1) & 0x3) != 0 &&
      ((b2 >> 4) & 0xf) != 0 && ((b2 >> 4) & 0xf) != 15 &&
      ((b2 >> 2) & 0x3) != 3
  }

  /** Walk every frame: skip ID3v2, stride frame to frame, and on a
    * failed header RESYNC (scan forward for the next valid one) so
    * one flipped byte costs the frames it corrupts, not the stream's
    * tail. Total work is one linear pass; never throws — truncation
    * and garbage yield fewer frames, the CodecFuzzSpec contract. */
  def frames(bytes: Array[Byte]): Seq[FrameInfo] = {
    val out = Seq.newBuilder[FrameInfo]
    var pos = math.min(id3v2Size(bytes), bytes.length)
    while (pos + 4 <= bytes.length) {
      parseHeaderAt(bytes, pos) match {
        case Some(f) => out += f; pos += f.sizeBytes
        case None => pos += 1 // resync scan
      }
    }
    out.result()
  }

  /** Whole-stream stats off one [[frames]] pass; None for a payload
    * with no parseable frame. Layer/rate/channels are the FIRST
    * frame's (a stream mixing them is corrupt; curation drops it on
    * `cbr`+layer checks, not here). */
  def streamInfo(bytes: Array[Byte]): Option[StreamInfo] = {
    val fs = frames(bytes)
    if (fs.isEmpty) return None
    val head = fs.head
    val brs = fs.map(_.bitrateKbps)
    val cbr = brs.distinct.size == 1
    val totalSamples = fs.map(_.samplesPerFrame.toLong).sum
    Some(StreamInfo(
      nFrames = fs.size,
      layer = head.layer,
      sampleRate = head.sampleRate,
      channels = head.channels,
      cbr = cbr,
      bitrateKbps = (brs.map(_.toLong).sum / fs.size).toInt,
      nPadded = fs.count(_.padding),
      totalSamples = totalSamples,
      durationMs = totalSamples * 1000L / head.sampleRate,
      bytesParsed = fs.map(_.sizeBytes.toLong).sum))
  }

  // ------------------------------------------------------------------
  // Xing/Info VBR header — the O(1) metadata path. A VBR stream's
  // duration is unknowable from one frame header; encoders therefore
  // put a "Xing" (VBR) or "Info" (CBR) tag in the FIRST frame's
  // otherwise-unused side-info region carrying total frames/bytes and
  // a 100-point seek TOC. At 100 TB this is the difference between
  // reading 4 KB per object and scanning every byte: [[quickInfo]]
  // answers duration/bitrate from the head frame alone and only the
  // tagless legacy case pays the full [[frames]] walk.
  // ------------------------------------------------------------------

  /** Parsed Xing/Info tag. `frames`/`streamBytes` are the AUDIO
    * frames/bytes FOLLOWING the tag frame (the convention
    * [[buildXingStream]] writes and [[quickInfo]] assumes); `vbr` is
    * true for the "Xing" magic, false for "Info". */
  final case class XingInfo(
      vbr: Boolean,
      frames: Option[Int],
      streamBytes: Option[Int],
      toc: Option[Array[Int]],
      quality: Option[Int])

  /** Side-info bytes between the MPEG-1 Layer III header (+CRC) and
    * the Xing magic: 17 mono / 32 stereo. */
  private def sideInfoLen(channels: Int): Int =
    if (channels == 1) 17 else 32

  /** Parse the Xing/Info tag out of the stream's FIRST frame (after
    * any ID3v2 prefix); None when absent/truncated. */
  def parseXing(bytes: Array[Byte]): Option[XingInfo] = {
    val start = math.min(id3v2Size(bytes), bytes.length)
    parseHeaderAt(bytes, start).flatMap { f =>
      if (f.layer != 3) return None // the tag is a Layer III practice
      var p = f.offset + 4 + (if (f.crc) 2 else 0) + sideInfoLen(f.channels)
      if (p + 8 > bytes.length || p + 8 > f.offset + f.sizeBytes)
        return None
      val magic = new String(bytes, p, 4, "US-ASCII")
      val vbr = magic == "Xing"
      if (!vbr && magic != "Info") return None
      p += 4
      def be32(at: Int): Int =
        ((bytes(at) & 0xff) << 24) | ((bytes(at + 1) & 0xff) << 16) |
          ((bytes(at + 2) & 0xff) << 8) | (bytes(at + 3) & 0xff)
      val flags = be32(p); p += 4
      val end = math.min(bytes.length, f.offset + f.sizeBytes)
      def take(n: Int): Boolean =
        if (p + n <= end) true else false
      val frames = if ((flags & 1) != 0 && take(4)) {
        val v = be32(p); p += 4; Some(v)
      } else if ((flags & 1) != 0) return None else None
      val nBytes = if ((flags & 2) != 0 && take(4)) {
        val v = be32(p); p += 4; Some(v)
      } else if ((flags & 2) != 0) return None else None
      val toc = if ((flags & 4) != 0 && take(100)) {
        val t = Array.tabulate(100)(i => bytes(p + i) & 0xff); p += 100
        Some(t)
      } else if ((flags & 4) != 0) return None else None
      val quality = if ((flags & 8) != 0 && take(4)) {
        val v = be32(p); p += 4; Some(v)
      } else if ((flags & 8) != 0) return None else None
      Some(XingInfo(vbr, frames, nBytes, toc, quality))
    }
  }

  /** O(1) stream stats from the head frame's Xing/Info tag: reads ONE
    * frame, never walks the stream. None when there is no tag (or no
    * frame count in it) — callers fall back to [[streamInfo]]'s full
    * walk for tagless legacy streams. Duration/bitrate derive from
    * the tag's counts: durationMs = frames·spf·1000/rate,
    * bitrate = streamBytes·8 / (frames·spf/rate) floored to kbps
    * (when byte count present; else the head frame's). Fields a
    * tag cannot know without a walk are sentinel: nPadded = -1, and
    * bytesParsed = -1 when the tag carries no byte count.
    *
    * INTEROP TOLERANCE (third-party files): this reader takes the
    * tag's `frames` field as the count of audio frames FOLLOWING the
    * tag frame — [[buildXingStream]] writes it that way and the t128
    * gate pins it — but in-the-wild encoders disagree on whether the
    * tag frame itself is included (LAME excludes it; some older
    * encoders count it). On external corpora treat quickInfo's
    * nFrames/duration/bitrate as carrying a ±1-frame (~26 ms at
    * 44.1 kHz) tolerance relative to [[streamInfo]]'s walk; before
    * using quickInfo counts for CURATION decisions on external data,
    * cross-check a sample against the walk and accept
    * |walk.nFrames − 1 − quick.nFrames| <= 1. */
  def quickInfo(bytes: Array[Byte]): Option[StreamInfo] = {
    val start = math.min(id3v2Size(bytes), bytes.length)
    for {
      head <- parseHeaderAt(bytes, start)
      tag <- parseXing(bytes)
      // a corrupt/overflowed 32-bit count (>= 2^31 reads back
      // negative) must fall back to the walk, never surface negative
      // durations no real walk could produce
      n <- tag.frames.filter(_ > 0)
    } yield {
      val totalSamples = n.toLong * head.samplesPerFrame
      val durationMs = totalSamples * 1000L / head.sampleRate
      val kbps = tag.streamBytes match {
        case Some(b) if durationMs > 0 && b > 0 =>
          (b.toLong * 8 / durationMs).toInt // bits/ms == kbps, floored
        case _ => head.bitrateKbps
      }
      StreamInfo(n, head.layer, head.sampleRate, head.channels,
        cbr = !tag.vbr, bitrateKbps = kbps, nPadded = -1,
        totalSamples = totalSamples, durationMs = durationMs,
        bytesParsed = tag.streamBytes.map(_.toLong).getOrElse(-1L))
    }
  }

  /** Prepend a Xing/Info tag frame to `audio` frames: the tag frame
    * reuses the first audio frame's parameters, zeroes its side info,
    * and carries frames/bytes counts (+ the standard 100-point byte-
    * offset TOC when `withToc`) describing the AUDIO portion. */
  def buildXingStream(layer: Int, srIdx: Int, n: Int, mono: Boolean,
      brIdxOf: Int => Int, paddingOf: Int => Boolean,
      vbr: Boolean = true, withToc: Boolean = false): Array[Byte] = {
    require(layer == 3, "Xing tags are a Layer III practice")
    require(n >= 1, s"a tagged stream needs at least one audio frame, got $n")
    val audio = buildStream(layer, srIdx, n, mono, brIdxOf, paddingOf)
    // the tag frame starts at the first audio frame's bitrate and
    // bumps the index until the payload fits (a TOC needs ~137 bytes;
    // a 32 kbps@44.1k frame has 104) — real encoders likewise size
    // the tag frame independently of the audio frames, and the parser
    // never requires them to agree
    val need = 4 + sideInfoLen(if (mono) 1 else 2) + 16 +
      (if (withToc) 100 else 0)
    var tagBr = brIdxOf(0)
    while (tagBr < 14 && frameSize(layer, BitrateKbps(layer)(tagBr),
        SampleRate(srIdx), padding = false) < need)
      tagBr += 1
    val tagFrame = buildFrame(layer, tagBr, srIdx,
      padding = false, mono)
    // zero the filler, then write the tag at the side-info boundary
    java.util.Arrays.fill(tagFrame, 4, tagFrame.length, 0.toByte)
    var p = 4 + sideInfoLen(if (mono) 1 else 2)
    val magic = if (vbr) "Xing" else "Info"
    require(p + 8 + 8 + (if (withToc) 100 else 0) <= tagFrame.length,
      "tag frame too small for the Xing payload at this bitrate")
    def put32(v: Int): Unit = {
      tagFrame(p) = (v >>> 24).toByte; tagFrame(p + 1) = (v >>> 16).toByte
      tagFrame(p + 2) = (v >>> 8).toByte; tagFrame(p + 3) = v.toByte
      p += 4
    }
    magic.getBytes("US-ASCII").copyToArray(tagFrame, p); p += 4
    put32(if (withToc) 7 else 3) // frames | bytes | (toc)
    put32(n)
    put32(audio.length)
    if (withToc) {
      // standard TOC: entry i = 256·(byte offset at i% of playtime)/
      // total bytes; frames are uniform per index here, so offsets
      // interpolate linearly over frame boundaries
      val sizes = (0 until n).map(i => frameSize(layer,
        BitrateKbps(layer)(brIdxOf(i)), SampleRate(srIdx), paddingOf(i)))
      val cum = sizes.scanLeft(0L)(_ + _)
      var i = 0
      while (i < 100) {
        val frameAt = i * n / 100
        tagFrame(p + i) = (cum(frameAt) * 256 / audio.length).toByte
        i += 1
      }
      p += 100
    }
    tagFrame ++ audio
  }

  /** One syntactically valid MPEG-1 frame: header + zero CRC slot (if
    * requested) + filler payload. `brIdx` 1..14, `srIdx` 0..2. */
  def buildFrame(layer: Int, brIdx: Int, srIdx: Int, padding: Boolean,
      mono: Boolean, withCrc: Boolean = false): Array[Byte] = {
    require(layer >= 1 && layer <= 3, s"layer 1..3, got $layer")
    require(brIdx >= 1 && brIdx <= 14, s"brIdx 1..14, got $brIdx")
    require(srIdx >= 0 && srIdx <= 2, s"srIdx 0..2, got $srIdx")
    val size = frameSize(layer, BitrateKbps(layer)(brIdx),
      SampleRate(srIdx), padding)
    val out = new Array[Byte](size)
    val layerBits = 4 - layer
    out(0) = 0xff.toByte
    out(1) = (0xe0 | 0x18 | (layerBits << 1) |
      (if (withCrc) 0 else 1)).toByte
    out(2) = ((brIdx << 4) | (srIdx << 2) |
      (if (padding) 2 else 0)).toByte
    out(3) = (if (mono) 0xc0 else 0x00).toByte
    var i = if (withCrc) 6 else 4
    while (i < size) { out(i) = (i & 0x7f).toByte; i += 1 }
    out
  }

  /** Concatenate `n` frames with per-index bitrate/padding selectors —
    * the gate's CBR (constant selector) and VBR (varying) fixture. */
  def buildStream(layer: Int, srIdx: Int, n: Int, mono: Boolean,
      brIdxOf: Int => Int, paddingOf: Int => Boolean): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < n) {
      bb.write(buildFrame(layer, brIdxOf(i), srIdx, paddingOf(i), mono))
      i += 1
    }
    bb.toByteArray
  }

  // ------------------------------------------------------------------
  // ID3v2 TEXT-FRAME layer — O(1) per-object metadata (the t128
  // read-the-head-not-the-stream pattern): titles/artists/albums and
  // user TXXX pairs are the dedup keys and source-attribution fields
  // media curation needs, and they live entirely inside the tag the
  // frame walker already skips (id3v2Size). Clean-room from the
  // public id3v2.3.0 / id3v2.4.0 informal standards; the declared
  // PCM-decode boundary is untouched. Reference surface: the
  // extractor feeds the same curation queries the reference's JSON
  // projections (P1/P4) feed for its entities — typed scalars pulled
  // from a nested container format.
  // ------------------------------------------------------------------

  /** One decoded ID3v2 text frame: `frameId` is the 4-char id (TIT2,
    * TPE1, TALB, …, or TXXX), `offset` the frame header's byte offset
    * within the payload, `description` the TXXX user-field name ("")
    * for standard T-frames), `text` the decoded value (trailing NULs
    * stripped). */
  final case class Id3Text(frameId: String, offset: Int,
      description: String, text: String)

  /** Decode the text frames (T*** incl. TXXX) of an ID3v2.3/2.4 tag
    * at offset 0. Empty when there is no tag, the tag is torn, or the
    * global-unsynchronisation flag is set (un-escaping FF 00 pairs is
    * spec-simple but never exercised by our writers — refused rather
    * than half-supported; per-frame v2.4 unsync frames are likewise
    * skipped). Non-text frames are strided over by their declared
    * size; padding (a zero where a frame id should start) ends the
    * walk. Frame sizes are BE-32 in v2.3 and SYNCSAFE-28 in v2.4 —
    * the versioned parse both the builder and the t130 oracle pin.
    * Text encodings: 0 = ISO-8859-1, 1 = UTF-16 (BOM), 2 = UTF-16BE
    * (v2.4), 3 = UTF-8 (v2.4). */
  def id3TextFrames(bytes: Array[Byte]): Seq[Id3Text] = {
    if (bytes.length < 10 || bytes(0) != 'I' || bytes(1) != 'D' ||
      bytes(2) != '3') return Nil
    val version = bytes(3) & 0xff
    if (version != 3 && version != 4) return Nil
    val flags = bytes(5) & 0xff
    if ((flags & 0x80) != 0) return Nil // global unsync: refused
    val tagEnd = math.min(id3v2Size(bytes), bytes.length)
    var p = 10
    // extended header: v2.3 size excludes its own 4 size bytes
    // (BE-32); v2.4 size is syncsafe and INCLUDES itself
    if ((flags & 0x40) != 0) {
      if (p + 4 > tagEnd) return Nil
      val raw =
        if (version == 3)
          (((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
            ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)) + 4
        else
          ((bytes(p) & 0x7f) << 21) | ((bytes(p + 1) & 0x7f) << 14) |
            ((bytes(p + 2) & 0x7f) << 7) | (bytes(p + 3) & 0x7f)
      if (raw < 4 || p + raw > tagEnd) return Nil
      p += raw
    }
    val out = Seq.newBuilder[Id3Text]
    while (p + 10 <= tagEnd && bytes(p) != 0) {
      val idOk = (0 until 4).forall { i =>
        val c = bytes(p + i) & 0xff
        (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
      }
      if (!idOk) return out.result()
      val frameId = new String(bytes, p, 4, "ISO-8859-1")
      val size =
        if (version == 4)
          ((bytes(p + 4) & 0x7f) << 21) | ((bytes(p + 5) & 0x7f) << 14) |
            ((bytes(p + 6) & 0x7f) << 7) | (bytes(p + 7) & 0x7f)
        else
          ((bytes(p + 4) & 0xff) << 24) | ((bytes(p + 5) & 0xff) << 16) |
            ((bytes(p + 6) & 0xff) << 8) | (bytes(p + 7) & 0xff)
      if (size < 0 || p + 10 + size > tagEnd) return out.result()
      val frameFlags = bytes(p + 9) & 0xff
      val unsyncFrame = version == 4 && (frameFlags & 0x02) != 0
      if (frameId.charAt(0) == 'T' && size >= 1 && !unsyncFrame) {
        val enc = bytes(p + 10) & 0xff
        val body = p + 11
        val bodyLen = size - 1
        def decode(from: Int, until: Int): Option[String] = enc match {
          case 0 => Some(new String(bytes, from, until - from,
            "ISO-8859-1"))
          case 1 => Some(new String(bytes, from, until - from, "UTF-16"))
          case 2 if version == 4 =>
            Some(new String(bytes, from, until - from, "UTF-16BE"))
          case 3 if version == 4 =>
            Some(new String(bytes, from, until - from, "UTF-8"))
          case _ => None
        }
        def stripNul(s: String): String =
          s.reverse.dropWhile(_ == '\u0000').reverse
        if (frameId == "TXXX" && bodyLen >= 1) {
          // description then value, split on the encoding's terminator
          val wide = enc == 1 || enc == 2
          var q = body
          val lim = body + bodyLen
          var term = -1
          while (term < 0 && (if (wide) q + 1 < lim else q < lim)) {
            val isNul =
              if (wide) bytes(q) == 0 && bytes(q + 1) == 0
              else bytes(q) == 0
            if (isNul) term = q else q += (if (wide) 2 else 1)
          }
          if (term >= 0) {
            val valStart = term + (if (wide) 2 else 1)
            for {
              d <- decode(body, term)
              v <- decode(valStart, lim)
            } out += Id3Text(frameId, p, d, stripNul(v))
          }
        } else if (frameId != "TXXX") {
          decode(body, body + bodyLen).foreach(t =>
            out += Id3Text(frameId, p, "", stripNul(t)))
        }
      }
      p += 10 + size
    }
    out.result()
  }

  /** Synthesize an ID3v2.3 or v2.4 tag: `textFrames` become T-frames
    * in declared order, `userFrames` become TXXX (description NUL
    * value), `padding` zero bytes follow. Text encoding is chosen per
    * frame so the [[id3TextFrames]] round trip is LOSSLESS: latin1-
    * representable text gets encoding 0 (ISO-8859-1); anything else
    * gets encoding 3 (UTF-8) under v2.4 and is REFUSED under v2.3
    * (whose only non-latin1 encoding is BOM'd UTF-16, which this
    * builder does not emit) — silently mapping 'café' to 'caf?' would
    * let distinct titles collide in dedup keys built from synthesized
    * tags. Frame sizes are written BE-32 (v2.3) or syncsafe (v2.4) —
    * the same versioned arithmetic [[id3TextFrames]] parses and the
    * t130 oracle rederives offset by offset. */
  def buildId3v2(version: Int, textFrames: Seq[(String, String)],
      userFrames: Seq[(String, String)] = Nil,
      padding: Int = 0): Array[Byte] = {
    require(version == 3 || version == 4, s"ID3v2.$version unsupported")
    require(padding >= 0)
    val bb = new java.io.ByteArrayOutputStream()
    def frame(id: String, payload: Array[Byte]): Unit = {
      require(id.length == 4, s"frame id must be 4 chars: $id")
      bb.write(id.getBytes("ISO-8859-1"))
      val n = payload.length
      if (version == 4) {
        bb.write((n >> 21) & 0x7f); bb.write((n >> 14) & 0x7f)
        bb.write((n >> 7) & 0x7f); bb.write(n & 0x7f)
      } else {
        bb.write((n >> 24) & 0xff); bb.write((n >> 16) & 0xff)
        bb.write((n >> 8) & 0xff); bb.write(n & 0xff)
      }
      bb.write(0); bb.write(0)
      bb.write(payload)
    }
    // encoding 0 iff every char is latin1-representable (getBytes
    // would otherwise substitute '?' — a silent lossy collision);
    // v2.4 falls back to encoding 3 (UTF-8), v2.3 refuses.
    def enc(texts: String*): Byte =
      if (texts.forall(_.forall(_ <= 'ÿ'))) 0
      else {
        require(version == 4, "non-latin1 text needs ID3v2.4 " +
          s"(UTF-8 frames): ${texts.mkString("|")}")
        3
      }
    def encode(e: Byte, s: String): Array[Byte] =
      s.getBytes(if (e == 0) "ISO-8859-1" else "UTF-8")
    textFrames.foreach { case (id, text) =>
      val e = enc(text)
      frame(id, e +: encode(e, text))
    }
    userFrames.foreach { case (desc, value) =>
      val e = enc(desc, value)
      frame("TXXX", e +:
        (encode(e, desc) ++ Array(0.toByte) ++ encode(e, value)))
    }
    bb.write(Array.fill(padding)(0.toByte))
    val body = bb.toByteArray
    val sz = body.length
    require(sz < (1 << 28), "tag too large for a syncsafe size")
    val head = Array[Byte]('I', 'D', '3', version.toByte, 0, 0,
      ((sz >> 21) & 0x7f).toByte, ((sz >> 14) & 0x7f).toByte,
      ((sz >> 7) & 0x7f).toByte, (sz & 0x7f).toByte)
    head ++ body
  }
}
