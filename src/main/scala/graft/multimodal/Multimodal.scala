package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` columns with typed metadata, processed per-partition
  * through a pluggable decoder.
  *
  * The Spark-side contract (schema, partitioning, batch shape) is real
  * and tested. The IMAGE codec is real — `ImageDecoder` /
  * `ImageResizer` wrap the JDK's javax.imageio (PNG/JPEG/BMP/GIF, no
  * external jars) — and so is the AUDIO codec for the container
  * formats the JDK ships (`AudioDecoder` wraps javax.sound.sampled:
  * WAV/AIFF/AU, 8/16-bit PCM, plus the COMPRESSED G.711 telephony
  * codecs μ-law/A-law via an exact integer expansion — surfaced as
  * typed samples by `decodeAudioSamples`). VIDEO is real for
  * Motion-JPEG (raw streams and MJPEG-in-AVI — `MjpegCodec` splits
  * the container on JPEG segment structure) AND for animated GIF
  * (`GifCodec` via javax.imageio, lossless — with genuine
  * INTER-FRAME decoding: sub-rectangle delta frames composite onto
  * the logical screen with disposal semantics): both feed
  * `sampleFramesDecoded`/`frameStats` through the same javax.imageio
  * path — gated bit-exact by t63/t75. FLAC decode is real too — our
  * own fuzz-tested codec ([[Flac]], CRC-8/CRC-16/MD5-verified), as
  * are IMA ADPCM and Y4M. MPEG audio (mp3/mp2/mp1) is PARSE-ONLY:
  * [[Mp3]] walks frames for duration/bitrate/integrity stats and
  * `pcmSamples` FAILS FAST on MPEG payloads with a routing message
  * (synthesis needs spec table data a clean-room build must not
  * guess — decode belongs in the pipeline's media-decode stage).
  * What remains STUBBED, declared, are the codecs the JDK genuinely
  * lacks: inter-frame video (H.264/VP9/AV1) and the remaining
  * perceptually-coded audio (ogg) fall back to deterministic fakes
  * with the same signature a JNI/FFI decoder would have.
  * `JdkDecoder` routes each modality to its real codec where one
  * exists.
  *
  * Scale design: rows carry bytes, so operations must be
  * partition-local (mapPartitions — one decoder instance per task, no
  * shuffle of binary payloads) and metadata-only plans must never touch
  * the `data` column (columnar parquet prunes it away — asserted in
  * MultimodalSpec).
  */
object Multimodal {

  // javax.imageio defaults to DISK-backed stream caching: every
  // ImageIO.read/write on an in-memory payload round-trips a temp
  // file. All payloads here are byte arrays, so memory-backed streams
  // are strictly better; object init runs once per JVM before any
  // codec call (every decode path lives in this object).
  javax.imageio.ImageIO.setUseCache(false)

  /** One media row: opaque payload + metadata. `data` is last so
    * metadata-only projections prune the heavy column. */
  case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      mime: String,
      width: Int,
      height: Int,
      duration_ms: Long,
      data: Array[Byte])

  case class MediaFeature(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float])

  /** Decoder boundary: the real implementation would wrap an image/
    * audio codec; tasks get one instance per partition. */
  trait Decoder extends Serializable {
    def decode(kind: String, bytes: Array[Byte]): Array[Float]
  }

  /** REAL image decoder via the JDK (`javax.imageio` ships with every
    * JRE — PNG/JPEG/BMP/GIF need no external jars): decodes the
    * payload to a BufferedImage and emits an 8-bin normalized
    * luminance histogram as the feature — deterministic, row-local,
    * one decoder per task. Non-image kinds fall back to [[FakeDecoder]]
    * (audio/video codecs genuinely are not in this container).
    * An image payload ImageIO cannot parse throws — corrupt media
    * should be quarantined upstream, not silently fingerprinted. */
  object ImageDecoder extends Decoder {
    /** 8-bin normalized luminance histogram of a decoded image —
      * shared by the image route and [[JdkDecoder]]'s video route
      * (first-frame histogram). */
    private[multimodal] def lumHistogram(
        img: java.awt.image.BufferedImage): Array[Float] = {
      val hist = new Array[Float](8)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist(lum >> 5) += 1f
          x += 1
        }
        y += 1
      }
      val n = (img.getWidth.toLong * img.getHeight).toFloat
      hist.map(_ / n)
    }

    override def decode(kind: String, bytes: Array[Byte]): Array[Float] = {
      if (kind != "image") FakeDecoder.decode(kind, bytes)
      else {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"undecodable image payload (${bytes.length} bytes)")
        lumHistogram(img)
      }
    }
  }

  /** REAL audio decoder via the JDK (`javax.sound.sampled` ships with
    * every JRE — WAV/AIFF/AU container parsing and 8/16-bit PCM need
    * no external jars): decodes the payload and emits an 8-segment
    * RMS-energy envelope as the feature — the audio twin of
    * [[ImageDecoder]]'s luminance histogram. Deterministic, row-local,
    * one decoder per task. Non-audio kinds fall back to
    * [[FakeDecoder]]; an audio payload the JDK cannot parse (or a
    * perceptual codec like mp3 — genuinely absent from this
    * container) throws, like the image path: corrupt media is
    * quarantined upstream, not silently fingerprinted. G.711
    * μ-law/A-law payloads decode for real — see [[pcmSamples]]. */
  object AudioDecoder extends Decoder {

    /** G.711 μ-law expansion: encoded byte → 14-bit-magnitude linear
      * sample (the CCITT segmented companding curve). Pure integer
      * arithmetic — complement, split into sign/segment/mantissa,
      * reconstruct the segment midpoint — so an external engine can
      * replay it exactly (the t74 gate recomputes every sample in
      * DuckDB); bit-identical to the JDK's own ULAW→PCM transcoder on
      * all 256 codes (spec-asserted). */
    def ulawToLinear(b: Int): Int = {
      val u = (~b) & 0xff
      val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
      if ((u & 0x80) != 0) 0x84 - t else t - 0x84
    }

    /** G.711 A-law expansion (the E1-world sibling): encoded byte →
      * 13-bit-magnitude linear sample. XOR the 0x55 toggle pattern,
      * then segment-expand; sign bit SET means positive (A-law's
      * polarity is inverted relative to μ-law). Same exact-integer
      * replayability contract as [[ulawToLinear]]. */
    def alawToLinear(b: Int): Int = {
      val a = b ^ 0x55
      val seg = (a & 0x70) >> 4
      var t = (a & 0x0f) << 4
      if (seg == 0) t += 8
      else { t += 0x108; t <<= seg - 1 }
      if ((a & 0x80) != 0) t else -t
    }

    /** IMA ADPCM step-size table (the 89-entry table from the IMA
      * Digital Audio Pack / Microsoft WAVE format 0x11 spec). */
    private[graft] val ImaStep: Array[Int] = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
      34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
      143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
      494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
      1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660,
      4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493,
      10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385,
      24623, 27086, 29794, 32767)

    private[graft] val ImaIndexDelta: Array[Int] =
      Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

    /** IMA ADPCM nibble-stream decode — the PREDICTIVE compressed
      * codec (each sample is reconstructed from the previous sample
      * plus a step-table delta, state carried sample to sample), the
      * audio analog of inter-frame video. Pure integer arithmetic:
      * diff = step/8 (+step if bit2, +step/2 if bit1, +step/4 if
      * bit0), sign from bit3, predictor clamped to int16, index
      * walked through the step table. Exactly the algorithm in the
      * IMA spec, so an external engine can replay the whole recursion
      * (the t82 oracle does, as a recursive CTE carrying
      * (predictor, index) per step). */
    def imaDecode(nibbles: Array[Int], pred0: Int = 0,
        index0: Int = 0): Array[Int] = {
      val out = new Array[Int](nibbles.length)
      var pred = pred0
      var idx = math.max(0, math.min(88, index0))
      var i = 0
      while (i < nibbles.length) {
        val n = nibbles(i) & 0xf
        val step = ImaStep(idx)
        var diff = step >> 3
        if ((n & 4) != 0) diff += step
        if ((n & 2) != 0) diff += step >> 1
        if ((n & 1) != 0) diff += step >> 2
        pred = if ((n & 8) != 0) pred - diff else pred + diff
        if (pred > 32767) pred = 32767
        if (pred < -32768) pred = -32768
        idx = math.max(0, math.min(88, idx + ImaIndexDelta(n)))
        out(i) = pred
        i += 1
      }
      out
    }

    /** True iff the payload is a RIFF/WAVE whose fmt chunk carries
      * format tag 0x11 (IMA ADPCM). */
    private def isImaAdpcmWav(bytes: Array[Byte]): Boolean = {
      if (bytes.length < 22) return false
      if (new String(bytes, 0, 4, "US-ASCII") != "RIFF" ||
          new String(bytes, 8, 4, "US-ASCII") != "WAVE") return false
      def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def le32(o: Int): Int = le16(o) | (le16(o + 2) << 16)
      var o = 12
      while (o + 8 <= bytes.length) {
        val tag = new String(bytes, o, 4, "US-ASCII")
        val len = le32(o + 4)
        // a corrupt/adversarial length (negative as Int, or big
        // enough to wrap o) must not stall the walk — not our format
        if (len < 0 || len > bytes.length) return false
        if (tag == "fmt ")
          return o + 10 <= bytes.length && le16(o + 8) == 0x11
        o += 8 + len + (len & 1)
      }
      false
    }

    /** Parse a mono IMA-ADPCM WAV (format tag 0x11 — a format the
      * JDK's WaveFileReader genuinely rejects, so the RIFF walk here
      * is ours): fmt gives rate and block size; each data block is a
      * 4-byte state header (initial predictor int16 LE — emitted as
      * the block's first sample, per spec — plus table index) and
      * then two nibbles per byte, LOW nibble first. Returns
      * (sampleRate, samples as the usual k/32768 fractions). */
    private def imaAdpcmSamples(bytes: Array[Byte]): (Float, Array[Float]) = {
      def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def le32(o: Int): Int = le16(o) | (le16(o + 2) << 16)
      require(bytes.length >= 44, "truncated WAV payload")
      var fmtOff = -1
      var fmtLen = 0
      var dataOff = -1
      var dataLen = 0
      var factSamples = -1L
      var o = 12
      while (o + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
        val tag = new String(bytes, o, 4, "US-ASCII")
        val len = le32(o + 4)
        require(len >= 0 && len <= bytes.length,
          s"corrupt RIFF chunk length $len") // never stall the walk
        if (tag == "fmt ") { fmtOff = o + 8; fmtLen = len }
        // fact: the true total sample count — a partial final block's
        // pad nibbles are NOT audio
        else if (tag == "fact" && len >= 4) factSamples = le32(o + 8).toLong
        else if (tag == "data") { dataOff = o + 8; dataLen = len }
        o += 8 + len + (len & 1)
      }
      require(fmtOff >= 0 && dataOff >= 0, "WAV missing fmt/data chunk")
      require(le16(fmtOff) == 0x11,
        s"not IMA ADPCM (fmt tag ${le16(fmtOff)})")
      require(le16(fmtOff + 2) == 1, "mono IMA ADPCM only")
      val rate = le32(fmtOff + 4)
      val blockAlign = le16(fmtOff + 12)
      require(blockAlign > 4, s"bad block align $blockAlign")
      // fmt extension: wSamplesPerBlock bounds each block's true
      // sample count (a standard encoder's last block is usually
      // partial — its trailing pad nibbles must not decode)
      val samplesPerBlock =
        if (fmtLen >= 20) le16(fmtOff + 18) else 1 + (blockAlign - 4) * 2
      require(samplesPerBlock >= 1, s"bad samples/block $samplesPerBlock")
      val out = Array.newBuilder[Float]
      var off = dataOff
      val end = math.min(dataOff + dataLen, bytes.length)
      while (off + 4 <= end) {
        val blockEnd = math.min(off + blockAlign, end)
        val pred0 = le16(off).toShort.toInt
        val idx0 = bytes(off + 2) & 0xff
        out += (pred0 / 32768.0).toFloat
        val nibs = Array.newBuilder[Int]
        var b = off + 4
        while (b < blockEnd) {
          val v = bytes(b) & 0xff
          nibs += (v & 0xf)
          nibs += (v >> 4)
          b += 1
        }
        val decoded = imaDecode(nibs.result(), pred0, idx0)
        var i = 0
        val blockCap = samplesPerBlock - 1 // header sample already out
        while (i < decoded.length && i < blockCap) {
          out += (decoded(i) / 32768.0).toFloat
          i += 1
        }
        off += blockAlign
      }
      val all = out.result()
      val trimmed =
        if (factSamples >= 0 && factSamples < all.length)
          all.take(factSamples.toInt)
        else all
      (rate.toFloat, trimmed)
    }

    /** The container/codec half alone: parse a WAV/AIFF/AU payload and
      * return (sampleRate, normalized samples in [-1, 1]) — shared by
      * the feature envelope below and [[decodeAudioSamples]]'s typed
      * sample output. Sample values are exact in Float (k/128 or
      * k/32768 for integer k), so downstream window arithmetic can be
      * made bit-reproducible by an external engine.
      *
      * Besides linear PCM, the COMPRESSED telephony codecs the JDK's
      * container readers surface — G.711 μ-law and A-law (WAV format
      * tags 7 and 6, and native AU μ-law) — decode for real: the
      * container parse stays in javax.sound, the 8-bit companded
      * payload expands through [[ulawToLinear]]/[[alawToLinear]], and
      * the result normalizes as k/32768 like 16-bit PCM. */
    def pcmSamples(bytes: Array[Byte]): (Float, Array[Float]) = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      // FLAC and IMA ADPCM (WAV format tag 0x11) route to our own
      // codecs FIRST — the JDK genuinely supports neither (both
      // rejections spec-asserted)
      if (Flac.isFlac(bytes)) return Flac.decode(bytes)
      if (isImaAdpcmWav(bytes)) return imaAdpcmSamples(bytes)
      // MPEG audio is PARSE-ONLY here (Mp3.frames/streamInfo):
      // synthesis needs the spec's table data, which a clean-room
      // build must not guess — fail with a routing hint, never with
      // an opaque JDK "stream of unsupported format". The probe is
      // field-level (looksLikeMpeg), so a TORN first frame — which
      // the strict isMp3 rejects — still routes here.
      require(!Mp3.looksLikeMpeg(bytes),
        "MPEG audio payloads are parse-only (use Mp3.streamInfo for " +
          "frame stats); route PCM decode to the media-decode stage")
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        // guard BEFORE any read: AudioInputStream.read returns 0
        // (not -1) when asked for less than one frame, and a header
        // mutated to an absurd frame size makes readAllBytes'
        // readNBytes loop on those 0-byte reads FOREVER (fuzz-found).
        // Two bounds: per-channel plausibility (<= 8 bytes/channel
        // covers every width the paths below accept, without capping
        // channel COUNT — a 33-channel soundfield capture is legal)
        // and the anti-spin invariant itself: a frame larger than the
        // whole payload can never complete a read.
        val frameSz = fmt.getFrameSize
        require(frameSz > 0 &&
          frameSz <= math.max(64L, fmt.getChannels.toLong * 8) &&
          frameSz <= bytes.length,
          s"implausible audio frame size $frameSz")
        if (enc == AudioFormat.Encoding.ULAW ||
            enc == AudioFormat.Encoding.ALAW) {
          val raw = ais.readAllBytes()
          require(raw.nonEmpty, "empty audio payload")
          val ulaw = enc == AudioFormat.Encoding.ULAW
          val out = new Array[Float](raw.length)
          var i = 0
          while (i < raw.length) {
            val k = if (ulaw) ulawToLinear(raw(i) & 0xff)
              else alawToLinear(raw(i) & 0xff)
            out(i) = (k / 32768.0).toFloat
            i += 1
          }
          return (fmt.getSampleRate, out)
        }
        require(enc == AudioFormat.Encoding.PCM_SIGNED ||
          enc == AudioFormat.Encoding.PCM_UNSIGNED,
          s"unsupported audio encoding $enc (PCM/ULAW/ALAW only)")
        val bits = fmt.getSampleSizeInBits
        require(bits == 8 || bits == 16,
          s"unsupported sample width $bits (8/16-bit PCM only)")
        val raw = ais.readAllBytes()
        val n = raw.length / (bits / 8)
        require(n > 0, "empty audio payload")
        val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
        val big = fmt.isBigEndian
        val out = new Array[Float](n)
        var i = 0
        while (i < n) {
          out(i) =
            if (bits == 8) {
              val b = raw(i) & 0xff
              ((if (unsigned) b - 128 else raw(i).toInt) / 128.0).toFloat
            } else {
              val off = i * 2
              val s =
                if (big) ((raw(off) << 8) | (raw(off + 1) & 0xff)).toShort
                else ((raw(off + 1) << 8) | (raw(off) & 0xff)).toShort
              ((if (unsigned) (s & 0xffff) - 32768 else s.toInt) / 32768.0)
                .toFloat
            }
          i += 1
        }
        (fmt.getSampleRate, out)
      } finally ais.close()
    }

    override def decode(kind: String, bytes: Array[Byte]): Array[Float] = {
      if (kind != "audio") FakeDecoder.decode(kind, bytes)
      else {
        val (_, samples) = pcmSamples(bytes)
        val n = samples.length
        val sumSq = new Array[Double](8)
        val cnt = new Array[Long](8)
        var i = 0
        while (i < n) {
          val v = samples(i).toDouble
          val seg = (i.toLong * 8 / n).toInt
          sumSq(seg) += v * v
          cnt(seg) += 1
          i += 1
        }
        Array.tabulate(8)(s =>
          if (cnt(s) == 0) 0f
          else math.sqrt(sumSq(s) / cnt(s)).toFloat)
      }
    }
  }

  /** Minimal mono PCM-16 WAV writer (RIFF/WAVE, fmt + data chunks,
    * little-endian) — the synthesis half that lets specs and the t64
    * gate drive the REAL javax.sound decode path with known sample
    * values, the audio twin of [[aviMjpeg]]. */
  def wavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** One decoded RIFF LIST/INFO tag: `offset` is the byte offset of
    * the sub-chunk's fourcc within the payload, `tag` the fourcc
    * (INAM title, IART artist, ICMT comment, …), `value` the text
    * with trailing NULs stripped (INFO text is historically
    * ISO-8859-1). */
  final case class RiffTag(offset: Int, tag: String, value: String)

  /** Decode the first LIST/INFO chunk of a RIFF/WAVE payload — the
    * WAV family's ID3v2/VORBIS_COMMENT sibling (t130/t131): O(1)
    * per-object title/artist/comment curation reads off the container
    * walk the decoders already do. Empty on a non-RIFF payload, a
    * missing INFO list, or any malformed/truncated framing (never
    * throws — the CodecFuzzSpec totality contract). Sub-chunks pad to
    * even, exactly like every other RIFF walk here. */
  def riffInfoTags(bytes: Array[Byte]): Seq[RiffTag] = {
    if (bytes.length < 12 ||
      new String(bytes, 0, 4, "US-ASCII") != "RIFF" ||
      new String(bytes, 8, 4, "US-ASCII") != "WAVE") return Nil
    def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    var o = 12
    while (o + 8 <= bytes.length) {
      val tag = new String(bytes, o, 4, "ISO-8859-1")
      val len = le32(o + 4)
      if (len < 0 || len > bytes.length - o - 8) return Nil
      if (tag == "LIST" && len >= 4 &&
        new String(bytes, o + 8, 4, "US-ASCII") == "INFO") {
        val end = o + 8 + len.toInt
        var p = o + 12
        val out = Seq.newBuilder[RiffTag]
        while (p + 8 <= end) {
          val sub = new String(bytes, p, 4, "ISO-8859-1")
          val slen = le32(p + 4)
          if (slen < 0 || slen > end - p - 8) return out.result()
          val raw = new String(bytes, p + 8, slen.toInt, "ISO-8859-1")
          out += RiffTag(p, sub,
            raw.reverse.dropWhile(_ == '\u0000').reverse)
          p += 8 + slen.toInt + (slen.toInt & 1)
        }
        return out.result()
      }
      o += 8 + len.toInt + (len.toInt & 1)
    }
    Nil
  }

  /** Append a LIST/INFO chunk to a RIFF/WAVE payload and fix the RIFF
    * size field: each (fourcc, value) becomes a sub-chunk whose body
    * is the ISO-8859-1 text + a terminating NUL, padded to even — the
    * exact arithmetic the t132 oracle rederives. Appending (the
    * common trailing-INFO layout) leaves every fmt/data offset
    * untouched, so decoders that ignore unknown chunks — including
    * javax.sound — read the audio unchanged (spec-asserted). */
  def withRiffInfo(wav: Array[Byte],
      tags: Seq[(String, String)]): Array[Byte] = {
    require(wav.length >= 12 &&
      new String(wav, 0, 4, "US-ASCII") == "RIFF" &&
      new String(wav, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE")
    val body = new java.io.ByteArrayOutputStream()
    body.write("INFO".getBytes("US-ASCII"))
    tags.foreach { case (fourcc, value) =>
      require(fourcc.length == 4, s"fourcc must be 4 chars: $fourcc")
      val vb = value.getBytes("ISO-8859-1")
      val stored = vb.length + 1 // terminating NUL
      body.write(fourcc.getBytes("ISO-8859-1"))
      body.write(stored & 0xff); body.write((stored >> 8) & 0xff)
      body.write((stored >> 16) & 0xff); body.write((stored >> 24) & 0xff)
      body.write(vb); body.write(0)
      if ((stored & 1) == 1) body.write(0) // pad to even
    }
    val list = body.toByteArray
    val out = java.nio.ByteBuffer
      .allocate(wav.length + 8 + list.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(wav, 0, 4)
      .putInt(wav.length - 8 + 8 + list.length) // fixed RIFF size
      .put(wav, 8, wav.length - 8)
      .put("LIST".getBytes("US-ASCII")).putInt(list.length)
      .put(list)
    out.array()
  }

  /** Minimal mono G.711 WAV writer (format tag 7 = μ-law, 6 = A-law;
    * 18-byte fmt chunk with cbSize=0, as non-PCM WAVE requires) — the
    * synthesis half that lets specs and the t74 gate drive the REAL
    * compressed-audio decode path (javax.sound container parse +
    * exact G.711 expansion) with known code values. */
  def wavG711(encoded: Array[Byte], sampleRate: Int,
      aLaw: Boolean = false): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(46 + encoded.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(38 + encoded.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(if (aLaw) 6 else 7) // WAVE_FORMAT_ALAW / MULAW
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate) // byte rate (1 byte/sample)
      .putShort(1) // block align
      .putShort(8) // bits
      .putShort(0) // cbSize
      .put("data".getBytes("US-ASCII")).putInt(encoded.length)
    buf.put(encoded)
    buf.array()
  }

  /** Minimal mono IMA-ADPCM WAV writer (format tag 0x11, one data
    * block): 4-byte state header (initial predictor, step index) then
    * the nibble stream packed LOW nibble first — the synthesis half
    * that lets specs and the t82 gate drive the REAL predictive
    * decode with known nibble values. Even nibble count required
    * (an odd count would need a pad nibble that decodes as a phantom
    * sample). */
  def wavImaAdpcm(nibbles: Array[Int], sampleRate: Int,
      pred0: Int = 0, index0: Int = 0): Array[Byte] = {
    require(nibbles.length % 2 == 0, "even nibble count required")
    require(pred0 >= -32768 && pred0 <= 32767 && index0 >= 0 && index0 <= 88)
    val blockAlign = 4 + nibbles.length / 2
    val samplesPerBlock = 1 + nibbles.length
    val dataLen = blockAlign
    val buf = java.nio.ByteBuffer.allocate(48 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(40 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11) // WAVE_FORMAT_IMA_ADPCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign / samplesPerBlock) // approx byte rate
      .putShort(blockAlign.toShort)
      .putShort(4) // bits per (encoded) sample
      .putShort(2) // cbSize
      .putShort(samplesPerBlock.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
      .putShort(pred0.toShort)
      .put(index0.toByte)
      .put(0.toByte)
    var i = 0
    while (i < nibbles.length) {
      buf.put(((nibbles(i) & 0xf) | ((nibbles(i + 1) & 0xf) << 4)).toByte)
      i += 2
    }
    buf.array()
  }

  /** One decoded audio row: normalized samples + rate, metadata first
    * so sample-free projections prune the array. */
  case class AudioSamples(
      media_id: Long,
      sample_rate: Int,
      n_samples: Int,
      samples: Array[Float])

  /** REAL audio decode to a typed samples column: per-partition
    * decoder instance, payload bytes never shuffled (the samples array
    * replaces them in place). Downstream feature math then stays in
    * native Column expressions ([[graft.functions.AudioOps]]) instead
    * of opaque per-row code. */
  def decodeAudioSamples(media: Dataset[MediaRecord]): Dataset[AudioSamples] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.map { r =>
        val (rate, s) = AudioDecoder.pcmSamples(r.data)
        AudioSamples(r.media_id, rate.toInt, s.length, s)
      }
    }
  }

  /** One decoded image row: integer luminance per pixel, row-major,
    * metadata first so pixel-free projections prune the array. */
  case class ImagePixels(
      media_id: Long,
      width: Int,
      height: Int,
      gray: Array[Int])

  /** REAL image decode to a typed grayscale-pixel column (the
    * [[decodeAudioSamples]] twin): per-partition javax.imageio
    * decoder, payload bytes never shuffled. Luminance is the same
    * integer (299r+587g+114b)/1000 as [[ImageDecoder]] — exact for
    * gray pixels, so a LOSSLESS codec (PNG/BMP) round-trips pixel
    * values bit-for-bit and downstream hash math
    * ([[graft.functions.ImageOps.dHash]]) stays in native Column
    * expressions an external engine can replay. */
  /** Decode + BT.601 integer luminance, shared by [[decodeImageGray]]
    * and [[decodeFrameGray]] — ONE copy of the conversion, so the
    * "same dHash as still images" equivalence the t80 gate rests on
    * cannot silently diverge. */
  private def grayPixelsOf(id: Long, bytes: Array[Byte],
      label: String): ImagePixels = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable $label payload (media $id)")
    val (w, h) = (img.getWidth, img.getHeight)
    // r12 perf: ONE bulk getRGB (same sRGB conversion path as the
    // per-pixel call, value-identical) instead of w*h virtual
    // dispatches through the ColorModel per pixel
    val rgbs = img.getRGB(0, 0, w, h, null, 0, w)
    val gray = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val rgb = rgbs(i)
      gray(i) =
        (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
      i += 1
    }
    ImagePixels(id, w, h, gray)
  }

  def decodeImageGray(media: Dataset[MediaRecord]): Dataset[ImagePixels] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.map(r => grayPixelsOf(r.media_id, r.data, "image"))
    }
  }

  /** JPEG images through OUR clean-room decoder
    * ([[graft.multimodal.Jpeg.decodeLuma]]) instead of javax.imageio
    * — same partition-local shape as [[decodeImageGray]] (payload
    * bytes never shuffled), but every decoded pixel is REPLAYABLE
    * arithmetic (the t136 chain), so downstream signatures over
    * LOSSY media verify cross-engine exactly (t141) where the
    * ImageIO path can only promise DC-exactness on solid frames
    * (t63). Gray JPEGs yield the luma plane verbatim; color ones the
    * reconstructed Y. Undecodable payloads fail the task loudly, as
    * [[grayPixelsOf]] does. */
  def decodeJpegGray(media: Dataset[MediaRecord]): Dataset[ImagePixels] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.map { r =>
        val (w, h, g) = Jpeg.decodeLuma(r.data).getOrElse(
          throw new IllegalArgumentException(
            s"undecodable JPEG payload (media ${r.media_id})"))
        ImagePixels(r.media_id, w, h, g)
      }
    }
  }

  /** Encode row-major gray values as a REAL (lossless) PNG — the
    * synthesis half that lets specs and gates drive
    * [[decodeImageGray]] through an actual codec with known pixels,
    * the [[wavPcm16]]/[[aviMjpeg]] pattern for images. */
  def grayPng(gray: Array[Int], width: Int, height: Int): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    // r12 perf: reuse one PNG ImageWriter per thread — ImageIO.write
    // re-scans the service registry and instantiates a fresh writer
    // per call, which dominates encode time for small tiles. Same
    // writer class, default params → byte-identical PNG output.
    val w = pngWriterTl.get()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      w.setOutput(ios)
      w.write(grayImage(gray, width, height))
    } finally {
      w.setOutput(null)
      ios.close()
    }
    baos.toByteArray
  }

  private val pngWriterTl =
    new ThreadLocal[javax.imageio.ImageWriter] {
      override def initialValue(): javax.imageio.ImageWriter =
        javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    }

  /** Row-major gray values → RGB BufferedImage (shared by the PNG and
    * GIF synthesis writers). Gray-only content has ≤256 distinct
    * colors, so even the palette-based GIF encode below is lossless. */
  private def grayImage(gray: Array[Int], width: Int,
      height: Int): java.awt.image.BufferedImage = {
    require(gray.length == width * height)
    import java.awt.image.BufferedImage
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    // r12 perf: one bulk setRGB (value-identical to the per-pixel
    // loop it replaces; TYPE_INT_RGB stores the ints verbatim)
    val rgbs = new Array[Int](width * height)
    var i = 0
    while (i < width * height) {
      val g = gray(i) & 0xff
      rgbs(i) = (g << 16) | (g << 8) | g
      i += 1
    }
    img.setRGB(0, 0, width, height, rgbs, 0, width)
    img
  }

  /** Minimal animated-GIF writer (javax.imageio's GIF encoder in
    * sequence mode — GIF89a, one image block per frame) — the
    * synthesis half that makes [[GifCodec]] testable end-to-end
    * against a REAL second container format, the [[aviMjpeg]] pattern.
    * Frames are row-major gray arrays; gray content fits the 256-entry
    * GIF palette exactly, so the encode is LOSSLESS and decoded pixel
    * stats are bit-exact (unlike MJPEG, which needs the solid-frame
    * DC argument). */
  def gifAnimated(frames: Seq[Array[Int]], width: Int,
      height: Int): Array[Byte] = {
    require(frames.nonEmpty)
    import javax.imageio.ImageIO
    val bo = new java.io.ByteArrayOutputStream()
    val w = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bo)
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      frames.foreach { g =>
        w.writeToSequence(
          new javax.imageio.IIOImage(grayImage(g, width, height), null, null),
          null)
      }
      w.endWriteSequence()
    } finally {
      w.dispose()
      ios.close()
    }
    bo.toByteArray
  }

  /** Routes each modality to its REAL JDK codec where one exists
    * (image → javax.imageio, audio → javax.sound.sampled, video →
    * the MJPEG/GIF container codecs: the feature is the first frame's
    * luminance histogram, the natural video analog of
    * [[ImageDecoder]]'s whole-image histogram). Only a video payload
    * NEITHER container codec parses falls back to the declared fake —
    * the honest boundary for the inter-frame codecs (H.264/VP9/AV1)
    * the JDK genuinely lacks. The default decoder a production
    * pipeline in this container should use. */
  object JdkDecoder extends Decoder {
    /** First displayable frame of a video container, decoded —
      * WITHOUT materializing the rest: a GIF payload (6-byte magic
      * checked first) reads only image index 0; MJPEG walks to the
      * first intact frame and stops. None = neither codec parses it. */
    private def firstVideoImage(
        bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      val isGif = bytes.length >= 4 &&
        new String(bytes, 0, 4, "US-ASCII") == "GIF8"
      if (isGif) {
        import javax.imageio.ImageIO
        val it = ImageIO.getImageReadersByFormatName("gif")
        if (!it.hasNext) return None
        val reader = it.next()
        try {
          reader.setInput(ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes)))
          Some(reader.read(0))
        } catch {
          // the JDK GIF plugin throws RuntimeExceptions (AIOOBE,
          // NegativeArraySize, IllegalArgument) on corrupt LZW
          // tables/descriptors, not just IOException — any parse
          // failure must fall back, never kill the task
          case scala.util.control.NonFatal(_) => None
        }
        finally reader.dispose()
      } else
        MjpegCodec.firstFrame(bytes).flatMap(f =>
          Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(f))))
    }

    override def decode(kind: String, bytes: Array[Byte]): Array[Float] =
      kind match {
        case "image" => ImageDecoder.decode(kind, bytes)
        case "audio" => AudioDecoder.decode(kind, bytes)
        case "video" =>
          firstVideoImage(bytes) match {
            case Some(img) => ImageDecoder.lumHistogram(img)
            case None => FakeDecoder.decode(kind, bytes)
          }
        case _ => FakeDecoder.decode(kind, bytes)
      }
  }

  /** Deterministic stand-in: fixed-length feature derived from byte
    * content — stable across runs/partitions so tests can assert.
    * The image and (PCM) audio halves of the boundary have REAL
    * implementations ([[ImageDecoder]], [[AudioDecoder]]); this fake
    * remains for video and for synthetic-payload tests. The lanes are
    * INTEGER byte sums (exact in f32 below 2²⁴ bytes of payload), so
    * an independent engine can reproduce the feature bit-for-bit —
    * the t59 gate recomputes it in DuckDB per byte position. */
  object FakeDecoder extends Decoder {
    override def decode(kind: String, bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](8)
      var i = 0
      while (i < bytes.length) {
        acc(i % 8) += (bytes(i) & 0xff)
        i += 1
      }
      acc
    }
  }

  /** Per-partition feature extraction: decoder instantiated once per
    * task, binary never shuffled. */
  def extractFeatures(media: Dataset[MediaRecord],
      decoder: Decoder = FakeDecoder): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val f = decoder.decode(r.kind, r.data)
        var cs = 0L
        var i = 0
        while (i < r.data.length) { cs = cs * 31 + (r.data(i) & 0xff); i += 1 }
        MediaFeature(r.media_id, r.kind, r.data.length.toLong, cs, f)
      }
    }
  }

  /** One sampled video frame: parent id + frame index + event time +
    * payload (last, for pruning). */
  case class FrameRecord(
      media_id: Long,
      frame_idx: Int,
      ts_ms: Long,
      width: Int,
      height: Int,
      frame: Array[Byte])

  /** Frame extractor boundary — a real implementation wraps a video
    * codec seek+decode; the stub slices the payload deterministically
    * so tests can assert content provenance. */
  trait FrameSampler extends Serializable {
    def frameAt(bytes: Array[Byte], tsMs: Long): Array[Byte]
  }

  object FakeFrameSampler extends FrameSampler {
    override def frameAt(bytes: Array[Byte], tsMs: Long): Array[Byte] =
      if (bytes.isEmpty) bytes
      else {
        val off = (tsMs % math.max(bytes.length, 1)).toInt
        Array(bytes(off), bytes((off + 1) % bytes.length))
      }
  }

  /** Sample one frame every `everyMs` from each video row — the
    * one-to-many flatMap shape of frame extraction. Partition-local
    * (one sampler per task); the expansion happens BEFORE any shuffle,
    * and each output row carries only its own frame bytes, so a
    * 2-hour video never rides a shuffle whole. */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long,
      sampler: FrameSampler = FakeFrameSampler): Dataset[FrameRecord] = {
    require(everyMs > 0)
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { r =>
        // every non-empty video yields at least frame 0 at ts=0 — a
        // clip shorter than the cadence must not vanish from the
        // frame corpus
        val n = math.max(if (r.duration_ms > 0) 1 else 0,
          (r.duration_ms / everyMs).toInt)
        (0 until n).iterator.map { i =>
          val ts = i * everyMs
          FrameRecord(r.media_id, i, ts, r.width, r.height,
            sampler.frameAt(r.data, ts))
        }
      }
    }
  }

  /** REAL video codec boundary: split a container payload into its
    * per-frame still-image payloads, index-ordered. Unlike
    * [[FrameSampler]] (ts → opaque bytes, satisfiable by a stub), this
    * boundary forces an implementation to produce DECODABLE frames. */
  trait VideoCodec extends Serializable {
    def frames(bytes: Array[Byte]): IndexedSeq[Array[Byte]]
  }

  /** REAL Motion-JPEG codec: finds each frame's SOI (FFD8), then walks
    * the JPEG SEGMENT structure to its EOI (FFD9) — every marker
    * segment carries a 2-byte big-endian length, so APPn payloads
    * (EXIF metadata INCLUDING an embedded JPEG thumbnail, whose own
    * SOI/EOI a raw marker scan would trip on) are skipped wholesale;
    * after SOS the entropy-coded body is scanned for the next true
    * marker, sound because entropy data byte-stuffs FF (always
    * followed by 00 or a RST marker). Works on a raw MJPEG stream AND
    * on MJPEG-in-AVI: RIFF chunk framing between frames never forms
    * an SOI. A frame whose segment structure is malformed (length
    * past end-of-data, missing EOI) is dropped and the scan
    * resynchronizes at the position the walk failed — a torn tail
    * chunk loses that frame, not the stream, and the torn frame's own
    * metadata (e.g. a thumbnail already walked past) is never re-read
    * as frame data. */
  object MjpegCodec extends VideoCodec {
    override def frames(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
      val out = IndexedSeq.newBuilder[Array[Byte]]
      val n = bytes.length
      def b(i: Int): Int = bytes(i) & 0xff
      var i = 0
      while (i < n - 1) {
        if (b(i) == 0xff && b(i + 1) == 0xd8) {
          val r = walkFrame(bytes, i)
          if (r >= 0) {
            out += java.util.Arrays.copyOfRange(bytes, i, r)
            i = r
          } else {
            // malformed: resync where the walk gave up (never before
            // the SOI we just tried, so the scan always advances)
            i = math.max(i + 2, -r - 1)
          }
        } else i += 1
      }
      out.result()
    }

    /** First intact frame only — stops scanning at the first
      * successful segment walk instead of materializing the whole
      * stream (the representative-frame fast path). */
    def firstFrame(bytes: Array[Byte]): Option[Array[Byte]] = {
      val n = bytes.length
      def b(i: Int): Int = bytes(i) & 0xff
      var i = 0
      while (i < n - 1) {
        if (b(i) == 0xff && b(i + 1) == 0xd8) {
          val r = walkFrame(bytes, i)
          if (r >= 0) return Some(java.util.Arrays.copyOfRange(bytes, i, r))
          i = math.max(i + 2, -r - 1)
        } else i += 1
      }
      None
    }

    /** End offset (exclusive) of the frame whose SOI is at `start`;
      * malformed/truncated structure returns -(failPos)-1, the scan
      * position at which parsing gave up. */
    private def walkFrame(bytes: Array[Byte], start: Int): Int = {
      val n = bytes.length
      def b(i: Int): Int = bytes(i) & 0xff
      def fail(pos: Int): Int = -pos - 1
      var p = start + 2
      while (p < n) {
        // fill bytes: any number of FFs may pad before a marker code
        while (p < n && b(p) == 0xff && p + 1 < n && b(p + 1) == 0xff)
          p += 1
        if (p + 1 >= n || b(p) != 0xff) return fail(p)
        val m = b(p + 1)
        if (m == 0xd9) return p + 2 // EOI
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) p += 2 // TEM/RSTn
        else if (m == 0xd8) return fail(p) // SOI here: previous frame torn
        else {
          if (p + 3 >= n) return fail(p)
          val len = (b(p + 2) << 8) | b(p + 3) // includes its own 2 bytes
          if (len < 2 || p + 2 + len > n) return fail(p + 2)
          val afterSeg = p + 2 + len
          if (m == 0xda) {
            // SOS: entropy-coded data until the next unstuffed marker
            var q = afterSeg
            while (q < n - 1 && !(b(q) == 0xff && b(q + 1) != 0x00 &&
                !(b(q + 1) >= 0xd0 && b(q + 1) <= 0xd7)))
              q += 1
            if (q >= n - 1) return fail(q)
            p = q
          } else p = afterSeg // APPn/DQT/DHT/SOF/COM/...: length skip
        }
      }
      fail(n)
    }
  }

  /** [[gifAnimated]]'s inter-frame sibling: frames as (gray, w, h,
    * left, top) SUB-RECTANGLES of the logical screen — the writer
    * sets each frame's ImageDescriptor offsets, producing the
    * delta-frame GIFs real encoders emit (only the changed rectangle
    * stored). The synthesis half that makes [[GifCodec]]'s
    * COMPOSITING path testable with known pixels; the first frame
    * should cover the full screen (it seeds the writer's logical
    * screen descriptor). */
  def gifAnimatedAt(frames: Seq[(Array[Int], Int, Int, Int, Int)]): Array[Byte] = {
    require(frames.nonEmpty)
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    val bo = new java.io.ByteArrayOutputStream()
    val w = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bo)
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      frames.foreach { case (g, fw, fh, left, top) =>
        val img = grayImage(g, fw, fh)
        val fmt = "javax_imageio_gif_image_1.0"
        val meta = w.getDefaultImageMetadata(
          new ImageTypeSpecifier(img), null)
        val tree = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        val kids = tree.getChildNodes
        var desc: IIOMetadataNode = null
        var i = 0
        while (i < kids.getLength) {
          kids.item(i) match {
            case n: IIOMetadataNode if n.getNodeName == "ImageDescriptor" =>
              desc = n
            case _ => ()
          }
          i += 1
        }
        if (desc == null) {
          desc = new IIOMetadataNode("ImageDescriptor")
          tree.appendChild(desc)
        }
        desc.setAttribute("imageLeftPosition", left.toString)
        desc.setAttribute("imageTopPosition", top.toString)
        desc.setAttribute("imageWidth", fw.toString)
        desc.setAttribute("imageHeight", fh.toString)
        desc.setAttribute("interlaceFlag", "FALSE")
        meta.setFromTree(fmt, tree)
        w.writeToSequence(new IIOImage(img, null, meta), null)
      }
      w.endWriteSequence()
    } finally {
      w.dispose()
      ios.close()
    }
    bo.toByteArray
  }

  /** REAL animated-GIF codec (the second real [[VideoCodec]], next to
    * [[MjpegCodec]]) — and a genuine INTER-FRAME decoder: GIF89a
    * frames may be sub-rectangles painted onto the previous state of
    * the logical screen (with per-frame disposal semantics), so each
    * emitted frame here is the COMPOSITED full canvas — stored raster
    * drawn at its (left, top) offset, transparency respected, then
    * the frame's disposal applied for the next one
    * (`restoreToBackgroundColor` clears the frame's rectangle,
    * `restoreToPrevious` reverts the canvas). Every frame re-encodes
    * as a LOSSLESS PNG payload so downstream consumers
    * ([[frameStats]], dHash) decode through the same javax.imageio
    * path as every other still image; full-frame GIFs (what
    * [[gifAnimated]] writes) compose to exactly their stored pixels.
    * An unparseable payload yields no frames and a torn tail loses
    * that frame, matching [[MjpegCodec]]'s corrupt-container policy. */
  object GifCodec extends VideoCodec {
    override def frames(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
      import java.awt.image.BufferedImage
      import javax.imageio.ImageIO
      val it = ImageIO.getImageReadersByFormatName("gif")
      if (!it.hasNext) return IndexedSeq.empty
      val reader = it.next()
      try {
        reader.setInput(ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
        val n =
          try reader.getNumImages(true)
          // the JDK GIF plugin throws RuntimeExceptions on corrupt
          // streams (AIOOBE, NegativeArraySize…), not just IOException
          catch { case scala.util.control.NonFatal(_) => 0 }
        if (n == 0) return IndexedSeq.empty
        // logical screen from stream metadata; fall back to frame 0
        val (lsW, lsH) =
          try {
            val tree = reader.getStreamMetadata.getAsTree(
              "javax_imageio_gif_stream_1.0")
              .asInstanceOf[org.w3c.dom.Element]
            val lsd = tree.getElementsByTagName("LogicalScreenDescriptor")
            if (lsd.getLength > 0) {
              val e = lsd.item(0).asInstanceOf[org.w3c.dom.Element]
              (e.getAttribute("logicalScreenWidth").toInt,
                e.getAttribute("logicalScreenHeight").toInt)
            } else (reader.getWidth(0), reader.getHeight(0))
          } catch { case _: Exception =>
            (reader.getWidth(0), reader.getHeight(0)) }
        var canvas = new BufferedImage(lsW, lsH, BufferedImage.TYPE_INT_ARGB)
        (0 until n).flatMap { i =>
          try {
            val img = reader.read(i)
            // per-frame placement + disposal from image metadata
            var (left, top, disposal) = (0, 0, "none")
            try {
              val t = reader.getImageMetadata(i).getAsTree(
                "javax_imageio_gif_image_1.0")
                .asInstanceOf[org.w3c.dom.Element]
              val d = t.getElementsByTagName("ImageDescriptor")
              if (d.getLength > 0) {
                val e = d.item(0).asInstanceOf[org.w3c.dom.Element]
                left = e.getAttribute("imageLeftPosition").toInt
                top = e.getAttribute("imageTopPosition").toInt
              }
              val g = t.getElementsByTagName("GraphicControlExtension")
              if (g.getLength > 0)
                disposal = g.item(0).asInstanceOf[org.w3c.dom.Element]
                  .getAttribute("disposalMethod")
            } catch { case _: Exception => () }
            val before =
              if (disposal == "restoreToPrevious") {
                val c = new BufferedImage(lsW, lsH,
                  BufferedImage.TYPE_INT_ARGB)
                val g = c.createGraphics()
                try g.drawImage(canvas, 0, 0, null) finally g.dispose()
                Some(c)
              } else None
            val g = canvas.createGraphics()
            try g.drawImage(img, left, top, null) finally g.dispose()
            val baos = new java.io.ByteArrayOutputStream()
            ImageIO.write(canvas, "png", baos)
            disposal match {
              case "restoreToBackgroundColor" =>
                val g2 = canvas.createGraphics()
                try {
                  g2.setComposite(java.awt.AlphaComposite.Clear)
                  g2.fillRect(left, top, img.getWidth, img.getHeight)
                } finally g2.dispose()
              case "restoreToPrevious" => before.foreach(canvas = _)
              case _ => () // none / doNotDispose: leave the canvas
            }
            Some(baos.toByteArray)
          } catch {
            // torn tail block: lose that frame, keep the stream —
            // MjpegCodec's malformed-frame policy. NonFatal, because
            // the JDK GIF plugin's corrupt-stream failures include
            // RuntimeExceptions beyond IndexOutOfBounds
            case scala.util.control.NonFatal(_) => None
          }
        }
      } finally reader.dispose()
    }
  }

  /** REAL YUV4MPEG2 (.y4m) codec — the THIRD real [[VideoCodec]] and
    * the UNCOMPRESSED one (the interchange format decoders emit and
    * toolchains test with): an ASCII stream header (`YUV4MPEG2 W.. H..
    * F.. C..`) followed by `FRAME<params>\n` records of raw planar
    * YUV. The Y plane IS the luminance raster, so each emitted frame
    * re-encodes it as a LOSSLESS grayscale PNG (the [[GifCodec]]
    * contract: frames decodable by the same javax.imageio path as
    * every still) and pixel stats are exact by format construction —
    * no codec arithmetic at all stands between the container bytes
    * and the numbers. Chroma planes are skipped by the colorspace's
    * size formula (C420*: w·h/2 extra bytes; C422: w·h; C444: 2·w·h;
    * Cmono: none; C tag absent defaults to C420 per the spec).
    * Unlike MJPEG/GIF, raw YUV has NO resync marker — a malformed
    * FRAME magic or a truncated frame body ends the stream there
    * (scanning pixel bytes for headers would fabricate frames), so a
    * torn tail loses the tail, never corrupts earlier frames. */
  object Y4mCodec extends VideoCodec {
    override def frames(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
      val n = bytes.length
      def lineEnd(from: Int): Int = {
        var i = from
        while (i < n && bytes(i) != 0x0a) i += 1
        i // == n when unterminated
      }
      val h0 = lineEnd(0)
      if (h0 >= n) return IndexedSeq.empty
      val header = new String(bytes, 0, h0, "US-ASCII")
      if (!header.startsWith("YUV4MPEG2")) return IndexedSeq.empty
      val tags = header.split(' ').drop(1)
      def tag(c: Char): Option[String] =
        tags.find(t => t.nonEmpty && t.head == c).map(_.tail)
      val (w, hgt) =
        try (tag('W').map(_.toInt).getOrElse(-1),
          tag('H').map(_.toInt).getOrElse(-1))
        catch { case _: NumberFormatException => (-1, -1) }
      if (w <= 0 || hgt <= 0 || w.toLong * hgt > (64 << 20))
        return IndexedSeq.empty
      val cs = tag('C').getOrElse("420") // C absent → 4:2:0 per spec
      val ySize = w * hgt
      val chromaSize =
        if (cs.startsWith("420")) (w / 2) * (hgt / 2) * 2
        else if (cs.startsWith("422")) (w / 2) * hgt * 2
        else if (cs.startsWith("444")) ySize * 2
        else if (cs.startsWith("mono")) 0
        else return IndexedSeq.empty
      val out = IndexedSeq.newBuilder[Array[Byte]]
      var p = h0 + 1
      var ok = true
      while (ok && p < n) {
        val fe = lineEnd(p)
        val magicOk = fe < n && fe - p >= 5 &&
          new String(bytes, p, 5, "US-ASCII") == "FRAME" &&
          (fe - p == 5 || bytes(p + 5) == ' ') // params are space-led
        if (!magicOk || fe + 1 + ySize + chromaSize > n) ok = false
        else {
          val yStart = fe + 1
          val gray = Array.tabulate(ySize)(i => bytes(yStart + i) & 0xff)
          out += grayPng(gray, w, hgt)
          p = yStart + ySize + chromaSize
        }
      }
      out.result()
    }
  }

  /** Minimal YUV4MPEG2 writer — the synthesis half for [[Y4mCodec]]
    * ([[aviMjpeg]]/[[gifAnimated]] pattern): frames are row-major
    * gray Y planes; chroma planes (for the subsampled colorspaces)
    * fill with the neutral 128, so the stream is a faithful gray
    * video under any YUV→RGB matrix. */
  def y4mVideo(frames: Seq[Array[Int]], width: Int, height: Int,
      colorspace: String = "420jpeg"): Array[Byte] = {
    require(frames.nonEmpty)
    require(colorspace == "mono" || (width % 2 == 0 && height % 2 == 0),
      "subsampled colorspaces need even dimensions")
    val chromaSize =
      if (colorspace.startsWith("420")) (width / 2) * (height / 2) * 2
      else if (colorspace.startsWith("422")) (width / 2) * height * 2
      else if (colorspace.startsWith("444")) width * height * 2
      else if (colorspace == "mono") 0
      else throw new IllegalArgumentException(s"colorspace $colorspace")
    val bo = new java.io.ByteArrayOutputStream()
    bo.write(s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C$colorspace\n"
      .getBytes("US-ASCII"))
    frames.foreach { g =>
      require(g.length == width * height)
      bo.write("FRAME\n".getBytes("US-ASCII"))
      g.foreach(v => bo.write(v & 0xff))
      var i = 0
      while (i < chromaSize) { bo.write(128); i += 1 }
    }
    bo.toByteArray
  }

  /** Minimal MJPEG-in-AVI writer (RIFF/AVI envelope with a `movi`
    * LIST of `00dc` compressed-video chunks — the standard layout) —
    * the synthesis half that makes [[MjpegCodec]] testable end-to-end
    * against a REAL container, used by specs and the t63 gate. Not a
    * general AVI muxer: headers carry just enough (frame count,
    * dimensions) for a marker-scanning or chunk-walking reader. */
  def aviMjpeg(frames: Seq[Array[Byte]], width: Int, height: Int): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(tag.getBytes("US-ASCII"))
      b.write(le32(body.length))
      b.write(body)
      if (body.length % 2 == 1) b.write(0) // RIFF chunks pad to even
      b.toByteArray
    }
    val movi = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("movi".getBytes("US-ASCII"))
      frames.foreach(f => b.write(chunk("00dc", f)))
      b.toByteArray
    }
    val avih = chunk("avih", le32(100000) ++ le32(0) ++ le32(0) ++
      le32(0x10) ++ le32(frames.size) ++ le32(0) ++ le32(1) ++
      le32(0) ++ le32(width) ++ le32(height) ++ new Array[Byte](16))
    val hdrl = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("hdrl".getBytes("US-ASCII"))
      b.write(avih)
      b.toByteArray
    }
    val riffBody = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("AVI ".getBytes("US-ASCII"))
      b.write(chunk("LIST", hdrl))
      b.write(chunk("LIST", movi))
      b.toByteArray
    }
    bo.write("RIFF".getBytes("US-ASCII"))
    bo.write(le32(riffBody.length))
    bo.write(riffBody)
    bo.toByteArray
  }

  /** Encode a solid-gray 8-bit JPEG frame — deterministic synthetic
    * frame content whose DECODE is bit-exact (a uniform block is
    * DC-only, and the DC round-trips at any quality; verified for all
    * 256 gray values), which is what lets an external engine oracle a
    * REAL lossy-codec pipeline by recomputing the gray value. */
  def solidJpeg(gray: Int, width: Int, height: Int): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    try {
      g2.setColor(new java.awt.Color(gray, gray, gray))
      g2.fillRect(0, 0, width, height)
    } finally g2.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** Per sampled frame: REAL pixel stats from a REAL decode.
    * `mean_lum` uses the same integer luminance as [[ImageDecoder]]
    * ((299r+587g+114b)/1000 — exact for gray: lum == gray). */
  case class FrameStat(
      media_id: Long,
      frame_idx: Int,
      ts_ms: Long,
      width: Int,
      height: Int,
      mean_lum: Double)

  /** Sample one frame every `everyMs` from each video row through a
    * REAL container codec: the payload splits into decodable frame
    * payloads once per row, and sample timestamps map to source frames
    * by uniform spacing (frame = ts·n/duration, clamped) — the
    * constant-fps contract an index-less MJPEG stream carries.
    * Partition-local like [[sampleFrames]]: expansion before any
    * shuffle, each output row carries one frame's bytes. Rows whose
    * payload contains no frames (corrupt/empty container) yield
    * nothing, mirroring zero-duration clips. */
  def sampleFramesDecoded(media: Dataset[MediaRecord], everyMs: Long,
      codec: VideoCodec = MjpegCodec): Dataset[FrameRecord] = {
    require(everyMs > 0)
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { r =>
        val fs = codec.frames(r.data)
        if (fs.isEmpty) Iterator.empty
        else {
          val n = math.max(if (r.duration_ms > 0) 1 else 0,
            (r.duration_ms / everyMs).toInt)
          (0 until n).iterator.map { i =>
            val ts = i * everyMs
            val src = math.min(fs.size - 1,
              (ts * fs.size / math.max(r.duration_ms, 1L)).toInt)
            FrameRecord(r.media_id, i, ts, r.width, r.height, fs(src))
          }
        }
      }
    }
  }

  /** Decode each sampled frame (javax.imageio — the same REAL path as
    * [[ImageDecoder]]) and emit pixel stats: decoded dimensions + mean
    * integer luminance. Partition-local; frame bytes never shuffle
    * (the stat row is a few scalars). Undecodable frame payloads
    * throw, matching the image path's quarantine-upstream contract. */
  def frameStats(frames: Dataset[FrameRecord]): Dataset[FrameStat] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { it =>
      it.map { f =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(f.frame))
        require(img != null,
          s"undecodable frame payload (media ${f.media_id} idx ${f.frame_idx})")
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight
        FrameStat(f.media_id, f.frame_idx, f.ts_ms,
          img.getWidth, img.getHeight, sum.toDouble / n)
      }
    }
  }

  /** Decode each sampled frame to typed grayscale pixels — the
    * [[decodeImageGray]] form for [[FrameRecord]]s, which is what lets
    * frame payloads feed the SAME native perceptual-hash expressions
    * as still images ([[graft.functions.ImageOps.dHash]]) and so the
    * same signature dedup machinery: video near-dup = frame decode →
    * dHash → `NearDup.dedupBySignature` (the t80 gate). Keyed by
    * media_id — callers selecting one representative frame per video
    * (e.g. `frame_idx == 0`) filter BEFORE decoding so only that
    * frame's bytes are ever touched. Partition-local; frame bytes
    * never shuffle. */
  def decodeFrameGray(frames: Dataset[FrameRecord]): Dataset[ImagePixels] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { it =>
      it.map(f => grayPixelsOf(f.media_id, f.frame, s"frame ${f.frame_idx}"))
    }
  }

  /** Scene-change detection over decoded frame stats: a boundary at
    * frame i (i > 0) wherever |mean_lum(i) − mean_lum(i−1)| ≥
    * `threshold` — the luminance-delta cut detector, the standard
    * first pass of clip segmentation for video training data. Pure
    * declarative window over the tiny per-frame stat rows (the heavy
    * decode already happened in [[frameStats]]); partitioned by
    * media_id, so a 2-hour video's frames sort within one task while
    * millions of videos spread across the cluster. Output:
    * (media_id, frame_idx, ts_ms, delta_lum) per boundary. */
  def sceneChanges(stats: Dataset[FrameStat], threshold: Double): DataFrame = {
    require(threshold > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    stats.toDF()
      .withColumn("__prev", lag(col("mean_lum"), 1).over(w))
      .filter(col("__prev").isNotNull &&
        abs(col("mean_lum") - col("__prev")) >= threshold)
      .select(col("media_id"), col("frame_idx"), col("ts_ms"),
        (col("mean_lum") - col("__prev")).as("delta_lum"))
  }

  /** Resize boundary — real implementation wraps an image resampler;
    * the stub length-scales the payload deterministically. */
  trait Resizer extends Serializable {
    def resize(bytes: Array[Byte], fromW: Int, fromH: Int,
        toW: Int, toH: Int): Array[Byte]
  }

  /** REAL image resampler via the JDK: decode (ImageIO), scale with
    * bilinear Graphics2D drawImage, re-encode as PNG (lossless — the
    * resized payload round-trips bit-stable). Throws on undecodable
    * payloads, like [[ImageDecoder]]. */
  object ImageResizer extends Resizer {
    override def resize(bytes: Array[Byte], fromW: Int, fromH: Int,
        toW: Int, toH: Int): Array[Byte] = {
      import java.awt.RenderingHints
      import java.awt.image.BufferedImage
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"undecodable image payload (${bytes.length} bytes)")
      val out = new BufferedImage(toW, toH, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, toW, toH, null)
      } finally g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.toByteArray
    }
  }

  object FakeResizer extends Resizer {
    override def resize(bytes: Array[Byte], fromW: Int, fromH: Int,
        toW: Int, toH: Int): Array[Byte] = {
      val n = math.max(1,
        (bytes.length.toLong * toW * toH /
          math.max(fromW.toLong * fromH, 1)).toInt)
      Array.tabulate(n)(i => bytes(i % math.max(bytes.length, 1)))
    }
  }

  /** Resize every image to (toW, toH): payload transformed in place,
    * metadata updated — partition-local, non-image rows pass through
    * untouched. */
  def resizeImages(media: Dataset[MediaRecord], toW: Int, toH: Int,
      resizer: Resizer = FakeResizer): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        if (r.kind != "image") r
        else r.copy(width = toW, height = toH,
          data = resizer.resize(r.data, r.width, r.height, toW, toH))
      }
    }
  }

  /** Metadata-only stats — must read zero bytes of `data` from parquet
    * (column pruning), the property that makes 100TB media tables
    * queryable. */
  def metadataStats(media: DataFrame): DataFrame =
    media.groupBy("kind")
      .agg(count(lit(1)).as("n"),
        avg(col("width") * col("height")).as("avg_pixels"),
        sum("duration_ms").as("total_duration_ms"))

  /** Write partitioned by kind so per-modality scans prune files. */
  def write(media: Dataset[MediaRecord], path: String): Unit =
    media.write.mode("overwrite").partitionBy("kind").parquet(path)
}
