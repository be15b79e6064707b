package graft.multimodal

/** Ogg container walk (RFC 3533) + Vorbis header metadata — closes the
  * declared Ogg/Vorbis stub (ARCHITECTURE.md): page-level structure,
  * granule arithmetic, the Ogg CRC, packet reassembly counts, and the
  * Vorbis identification/comment headers. Audio DECODE (Vorbis MDCT +
  * codebooks) stays out — codebook reconstruction is the same
  * clean-room boundary Mp3.scala declares for its spec tables, and the
  * curation signals (duration, rate, channels, tags, page health) are
  * all container-level.
  *
  * Page layout: "OggS" | version 0 | header_type (0x01 continued,
  * 0x02 BOS, 0x04 EOS) | granule i64le | serial u32le | page_seq u32le
  * | crc u32le | n_segments u8 | lacing values | payload. A packet is
  * a run of lacing values ending at the first < 255; a page whose last
  * lacing is 255 continues its packet on the next page (which sets the
  * continued flag). The CRC is CRC-32 poly 0x04c11db7, init 0, NO
  * reflection, NO final xor (Ogg's own variant — zlib's reflected CRC
  * does not match), computed over the page with the CRC field zeroed.
  *
  * Scale: the walk is a single forward pass with MP3-style resync
  * (a corrupt page body skips to the next "OggS" capture pattern);
  * decode is partition-local over the opaque binary column.
  */
object Ogg {

  /** Ogg CRC lookup table: poly 0x04c11db7, MSB-first. */
  val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        k += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  /** Ogg CRC over `bytes[from, from+len)` (init 0, no xor-out). */
  def crc32(bytes: Array[Byte], from: Int, len: Int,
      zeroRange: Option[(Int, Int)] = None): Long = {
    var crc = 0
    var i = from
    val end = from + len
    while (i < end) {
      val b = zeroRange match {
        case Some((z0, z1)) if i >= z0 && i < z1 => 0
        case _ => bytes(i) & 0xff
      }
      crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ b) & 0xff)
      i += 1
    }
    crc.toLong & 0xffffffffL
  }

  /** One walked page. `nCompletePackets` counts packets that END on
    * this page (a spanning tail completing here counts here — the
    * granule-position convention). */
  final case class Page(offset: Int, headerType: Int, granule: Long,
      serial: Long, seq: Long, crcStored: Long, crcOk: Boolean,
      nSegments: Int, payloadLen: Int, nCompletePackets: Int) {
    def continued: Boolean = (headerType & 0x01) != 0
    def bos: Boolean = (headerType & 0x02) != 0
    def eos: Boolean = (headerType & 0x04) != 0
  }

  /** Forward page walk with resync: a malformed header or truncated
    * body abandons that capture and scans for the next "OggS"; a page
    * whose CRC FAILS is still reported (corruption accounting needs
    * it) but its declared lengths are NOT trusted — the scan resumes
    * one byte past the capture, so a corrupted segment table can
    * never swallow the valid pages behind it. Never throws. */
  def pages(bytes: Array[Byte]): IndexedSeq[Page] = {
    val out = IndexedSeq.newBuilder[Page]
    if (bytes == null) return out.result()
    var p = 0
    while (p + 27 <= bytes.length) {
      if (bytes(p) == 'O' && bytes(p + 1) == 'g' && bytes(p + 2) == 'g' &&
          bytes(p + 3) == 'S' && bytes(p + 4) == 0) {
        parsePage(bytes, p) match {
          case Some((page, next)) =>
            out += page
            p = if (page.crcOk) next else p + 1
          case None => p += 1 // resync
        }
      } else p += 1
    }
    out.result()
  }

  private def parsePage(bytes: Array[Byte],
      p: Int): Option[(Page, Int)] = {
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def i64(o: Int): Long = {
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (bytes(o + i) & 0xffL); i -= 1 }
      v
    }
    val headerType = bytes(p + 5) & 0xff
    val granule = i64(p + 6)
    val serial = u32(p + 14)
    val seq = u32(p + 18)
    val crcStored = u32(p + 22)
    val nSegs = bytes(p + 26) & 0xff
    val lacingEnd = p + 27 + nSegs
    if (lacingEnd > bytes.length) return None
    var payload = 0
    var packets = 0
    var i = p + 27
    while (i < lacingEnd) {
      val l = bytes(i) & 0xff
      payload += l
      if (l < 255) packets += 1
      i += 1
    }
    val pageEnd = lacingEnd + payload
    if (pageEnd > bytes.length) return None
    val crc = crc32(bytes, p, pageEnd - p, zeroRange = Some((p + 22, p + 26)))
    Some((Page(p, headerType, granule, serial, seq, crcStored,
      crc == crcStored, nSegs, payload, packets), pageEnd))
  }

  /** O(head+tail) stream info, the t127/t130 quick pattern: channels
    * and sample rate from the BOS Vorbis identification header, total
    * samples from the LAST page's granule position (backward capture
    * scan over the tail window), duration derived. None when the head
    * is not an Ogg Vorbis stream. */
  final case class QuickInfo(channels: Int, sampleRate: Long,
      totalSamples: Long, durationMicros: Long)

  def quickInfo(bytes: Array[Byte], tailWindow: Int = 65536)
      : Option[QuickInfo] = {
    val head = pages(bytes.take(512)).headOption.filter(_.bos)
    head.flatMap { h =>
      vorbisIdent(bytes).flatMap { case (ch, rate) =>
        if (rate <= 0) None
        else {
          val from = math.max(0, bytes.length - tailWindow)
          val tail = pages(bytes.drop(from))
          val granule = tail.filter(p => p.crcOk && p.granule >= 0)
            .lastOption.map(_.granule).getOrElse(0L)
          Some(QuickInfo(ch, rate, granule,
            granule * 1000000L / rate))
        }
      }
    }
  }

  /** (channels, sampleRate) from the Vorbis identification header —
    * the first packet of the BOS page: "\\x01vorbis" + u32 version(0)
    * + u8 channels + u32le rate + ... */
  def vorbisIdent(bytes: Array[Byte]): Option[(Int, Long)] = {
    val ps = pages(bytes)
    ps.headOption.filter(p => p.bos && p.crcOk).flatMap { p =>
      val body = p.offset + 27 + p.nSegments
      if (body + 16 > bytes.length) None
      else if ((bytes(body) & 0xff) != 0x01 ||
        new String(bytes, body + 1, 6, "ISO-8859-1") != "vorbis") None
      else {
        val ch = bytes(body + 11) & 0xff
        val rate = (bytes(body + 12) & 0xffL) |
          ((bytes(body + 13) & 0xffL) << 8) |
          ((bytes(body + 14) & 0xffL) << 16) |
          ((bytes(body + 15) & 0xffL) << 24)
        Some((ch, rate))
      }
    }
  }

  /** Vorbis comment header fields from the packet opening
    * "\\x03vorbis" (page 2 in a spec-shaped stream): same
    * length-prefixed layout as FLAC's VORBIS_COMMENT, so the payload
    * parse is shared behavior with [[Flac.vorbisComments]]. Packet
    * reassembly: consecutive pages' payloads are concatenated until
    * the packet completes (lacing < 255). */
  def vorbisComments(bytes: Array[Byte]): Option[Flac.VorbisComments] = {
    val ps = pages(bytes)
    // find the page whose FIRST packet byte is 0x03 'vorbis' among the
    // first few pages (the comment header is packet 2 of the stream)
    var idx = 0
    while (idx < math.min(ps.length, 8)) {
      val p = ps(idx)
      val body = p.offset + 27 + p.nSegments
      if (p.crcOk && !p.continued && body + 7 <= bytes.length &&
          (bytes(body) & 0xff) == 0x03 &&
          new String(bytes, body + 1, 6, "ISO-8859-1") == "vorbis") {
        // reassemble this packet across pages
        val buf = new java.io.ByteArrayOutputStream()
        var i = idx
        var done = false
        while (!done && i < ps.length) {
          val pg = ps(i)
          val b0 = pg.offset + 27 + pg.nSegments
          // walk this page's lacing for the FIRST packet only (the
          // comment header is the page's first packet by construction
          // of the header sequence)
          var off = 0
          var li = pg.offset + 27
          var stop = false
          while (!stop && li < pg.offset + 27 + pg.nSegments) {
            val l = bytes(li) & 0xff
            buf.write(bytes, b0 + off, l)
            off += l
            if (l < 255) { stop = true; done = true }
            li += 1
          }
          if (!done) i += 1 // packet continues on the next page
        }
        if (!done) return None
        val pk = buf.toByteArray
        return parseCommentPacket(pk)
      }
      idx += 1
    }
    None
  }

  private def parseCommentPacket(
      pk: Array[Byte]): Option[Flac.VorbisComments] = {
    var p = 7 // past \x03vorbis
    def le32(at: Int): Long =
      (pk(at) & 0xffL) | ((pk(at + 1) & 0xffL) << 8) |
        ((pk(at + 2) & 0xffL) << 16) | ((pk(at + 3) & 0xffL) << 24)
    if (p + 4 > pk.length) return None
    val vlen = le32(p); p += 4
    if (vlen > pk.length - p) return None
    val vendor = new String(pk, p, vlen.toInt, "UTF-8")
    p += vlen.toInt
    if (p + 4 > pk.length) return None
    val n = le32(p); p += 4
    val out = Seq.newBuilder[Flac.VorbisField]
    var i = 0L
    while (i < n) {
      if (p + 4 > pk.length) return None
      val flen = le32(p)
      if (flen > pk.length - p - 4) return None
      val s = new String(pk, p + 4, flen.toInt, "UTF-8")
      val eq = s.indexOf('=')
      if (eq > 0) out += Flac.VorbisField(p,
        s.substring(0, eq).toUpperCase(java.util.Locale.ROOT),
        s.substring(eq + 1))
      p += 4 + flen.toInt
      i += 1
    }
    Some(Flac.VorbisComments(vendor, out.result()))
  }

  // ------------------------------------------------------------------
  // synthesis writer (the t63/t75 pattern: deterministic fixture side)
  // ------------------------------------------------------------------

  /** One page. `pieces` are (bytes, endsPacket): a piece that does NOT
    * end its packet must be a multiple of 255 bytes long (RFC 3533's
    * page-spanning rule — its lacing is all 255s and the packet
    * continues on the next page, which must set the continued flag). */
  def page(headerType: Int, granule: Long, serial: Long, seq: Long,
      pieces: Seq[(Array[Byte], Boolean)]): Array[Byte] = {
    val lacing = pieces.flatMap { case (b, ends) =>
      val full = b.length / 255
      val rem = b.length % 255
      if (!ends) {
        require(rem == 0 && b.length > 0,
          "a continuing piece must be a positive multiple of 255")
        Seq.fill(full)(255)
      } else Seq.fill(full)(255) :+ rem
    }
    require(lacing.length <= 255, "too many lacing values for one page")
    val payload = pieces.flatMap(_._1).toArray
    val out = new Array[Byte](27 + lacing.length + payload.length)
    out(0) = 'O'; out(1) = 'g'; out(2) = 'g'; out(3) = 'S'
    out(4) = 0
    out(5) = headerType.toByte
    var i = 0
    while (i < 8) { out(6 + i) = ((granule >> (8 * i)) & 0xff).toByte; i += 1 }
    i = 0
    while (i < 4) {
      out(14 + i) = ((serial >> (8 * i)) & 0xff).toByte
      out(18 + i) = ((seq >> (8 * i)) & 0xff).toByte
      i += 1
    }
    out(26) = lacing.length.toByte
    i = 0
    while (i < lacing.length) { out(27 + i) = lacing(i).toByte; i += 1 }
    System.arraycopy(payload, 0, out, 27 + lacing.length, payload.length)
    val crc = crc32(out, 0, out.length)
    i = 0
    while (i < 4) { out(22 + i) = ((crc >> (8 * i)) & 0xff).toByte; i += 1 }
    out
  }

  /** Vorbis identification header packet (30 bytes). */
  def vorbisIdentPacket(channels: Int, sampleRate: Long): Array[Byte] = {
    val b = new Array[Byte](30)
    b(0) = 0x01
    "vorbis".getBytes("ISO-8859-1").copyToArray(b, 1)
    // u32 version = 0 at 7..10
    b(11) = channels.toByte
    var i = 0
    while (i < 4) { b(12 + i) = ((sampleRate >> (8 * i)) & 0xff).toByte; i += 1 }
    // bitrate max/nominal/min left 0 (unset), 16..27
    b(28) = 0xb8.toByte // blocksizes 256/8192 (log2 8 | log2 11 << 4)
    b(29) = 0x01 // framing bit
    b
  }

  // ------------------------------------------------------------------
  // DuckDB replay helpers (the Jpeg.duckKernelSql pattern): the t143
  // oracle rebuilds page byte lists and folds the Ogg CRC over them
  // ------------------------------------------------------------------

  /** CTE `__ogg_crc(tbl)`: the 256-entry Ogg CRC table as one list
    * column (unsigned values). */
  def duckCrcTableSql(): String = {
    val vals = CrcTable.map(_ & 0xffffffffL).mkString("[", ", ", "]")
    s"__ogg_crc AS (SELECT $vals AS tbl)"
  }

  /** SQL expression folding the Ogg CRC over a BIGINT byte-list
    * expression (requires `__ogg_crc` joined in scope): init 0, MSB
    * -first, no xor-out — (crc<<8 & 0xFFFFFFFF) ^ tbl[(crc>>24 ^ b)].
    * list_reduce uses the first element as the initial accumulator,
    * hence the prepended 0. */
  def duckCrcFoldSql(byteListExpr: String): String =
    s"list_reduce([0::BIGINT] || ($byteListExpr), (a, b) -> " +
      "xor((a * 256) % 4294967296, " +
      "tbl[(xor(a // 16777216, b) % 256) + 1]))"

  /** Vorbis comment header packet: "\\x03vorbis" + the shared
    * length-prefixed payload + framing bit. */
  def vorbisCommentPacket(vendor: String,
      fields: Seq[(String, String)]): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    bb.write(0x03)
    bb.write("vorbis".getBytes("ISO-8859-1"))
    def le32(v: Int): Unit = {
      bb.write(v & 0xff); bb.write((v >> 8) & 0xff)
      bb.write((v >> 16) & 0xff); bb.write((v >> 24) & 0xff)
    }
    val vb = vendor.getBytes("UTF-8")
    le32(vb.length); bb.write(vb, 0, vb.length)
    le32(fields.length)
    fields.foreach { case (k, v) =>
      val fb = s"$k=$v".getBytes("UTF-8")
      le32(fb.length); bb.write(fb, 0, fb.length)
    }
    bb.write(0x01)
    bb.toByteArray
  }
}
