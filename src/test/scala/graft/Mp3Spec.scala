package graft

import graft.multimodal.Mp3
import org.scalatest.funsuite.AnyFunSuite

/** Frame-layer facts pinned against hand-computed ISO arithmetic —
  * no SparkSession needed (pure parsing). */
class Mp3Spec extends AnyFunSuite {

  test("Layer III frame sizes: the canonical 128kbps@44.1k case and " +
    "friends, hand-computed") {
    // 144000*128/44100 = 417.96 -> 417; +1 when padded
    def size(br: Int, sr: Int, pad: Boolean) = {
      val brIdx = Mp3.BitrateKbps(3).indexOf(br)
      val srIdx = Mp3.SampleRate.indexOf(sr)
      Mp3.buildFrame(3, brIdx, srIdx, pad, mono = true).length
    }
    assert(size(128, 44100, pad = false) == 417)
    assert(size(128, 44100, pad = true) == 418)
    assert(size(128, 48000, pad = false) == 384)
    assert(size(320, 32000, pad = false) == 1440)
    assert(size(32, 48000, pad = false) == 96)
  }

  test("Layer I slot-of-4 sizing") {
    // (12*448000/44100 + 0)*4 = 121*4 = 484
    assert(Mp3.buildFrame(1, 14, 0, padding = false,
      mono = true).length == 484)
    // padding adds one 4-byte slot in Layer I
    assert(Mp3.buildFrame(1, 14, 0, padding = true,
      mono = true).length == 488)
  }

  test("header round trip: every (layer, brIdx, srIdx, pad, mode) " +
    "builds a frame the parser reads back exactly") {
    for {
      layer <- 1 to 3
      brIdx <- 1 to 14
      srIdx <- 0 to 2
      pad <- Seq(false, true)
      mono <- Seq(false, true)
    } {
      val bytes = Mp3.buildFrame(layer, brIdx, srIdx, pad, mono)
      val f = Mp3.parseHeaderAt(bytes, 0).getOrElse(
        fail(s"unparseable: layer=$layer br=$brIdx sr=$srIdx"))
      assert(f.layer == layer)
      assert(f.bitrateKbps == Mp3.BitrateKbps(layer)(brIdx))
      assert(f.sampleRate == Mp3.SampleRate(srIdx))
      assert(f.padding == pad)
      assert(f.channels == (if (mono) 1 else 2))
      assert(f.sizeBytes == bytes.length)
      assert(f.samplesPerFrame == (if (layer == 1) 384 else 1152))
    }
  }

  test("ID3v2 prefix skipped, syncsafe size honored; isMp3 dispatch") {
    val body = Mp3.buildStream(3, 0, 3, mono = true, _ => 9, _ => false)
    val extra = 200 // > 127, so the syncsafe split matters
    val tag = new Array[Byte](10 + extra)
    tag(0) = 'I'; tag(1) = 'D'; tag(2) = '3'; tag(3) = 4
    tag(8) = ((extra >> 7) & 0x7f).toByte
    tag(9) = (extra & 0x7f).toByte
    val payload = tag ++ body
    assert(Mp3.isMp3(payload) && Mp3.isMp3(body))
    assert(!Mp3.isMp3(tag)) // tag alone: no frame
    assert(Mp3.frames(payload).size == 3)
    assert(Mp3.frames(payload).head.offset == 10 + extra)
  }

  test("Xing/Info tag: O(1) quickInfo matches the tag's counts; TOC " +
    "offsets are monotone and scaled; Info flags CBR") {
    val n = 12
    val brOf: Int => Int = i => 1 + (i % 14)
    val padOf: Int => Boolean = i => i % 3 == 0
    val vbr = Mp3.buildXingStream(3, 0, n, mono = true, brOf, padOf,
      vbr = true, withToc = true)
    val tag = Mp3.parseXing(vbr).getOrElse(fail("no Xing tag parsed"))
    assert(tag.vbr && tag.frames.contains(n))
    val audioBytes = (0 until n).map(i => Mp3.buildFrame(3, brOf(i), 0,
      padOf(i), mono = true).length).sum
    assert(tag.streamBytes.contains(audioBytes))
    val toc = tag.toc.getOrElse(fail("no TOC"))
    assert(toc.length == 100 && toc.head == 0)
    assert(toc.zip(toc.tail).forall { case (a, b) => a <= b },
      "TOC must be monotone")
    // quickInfo reads ONLY the head frame; the full walk sees the tag
    // frame as one extra audio frame (counts n+1)
    val q = Mp3.quickInfo(vbr).getOrElse(fail("no quickInfo"))
    assert(q.nFrames == n && !q.cbr)
    assert(q.durationMs == n.toLong * 1152 * 1000 / 44100)
    assert(q.bitrateKbps ==
      (audioBytes.toLong * 8 / q.durationMs).toInt)
    assert(Mp3.streamInfo(vbr).get.nFrames == n + 1)
    // "Info" magic = CBR
    val cbrStream = Mp3.buildXingStream(3, 1, 4, mono = true,
      _ => 9, _ => false, vbr = false)
    val qi = Mp3.quickInfo(cbrStream).get
    assert(qi.cbr && qi.nFrames == 4)
    // tagless stream: quickInfo None -> callers walk
    assert(Mp3.quickInfo(Mp3.buildStream(3, 0, 3, mono = true,
      _ => 9, _ => false)).isEmpty)
    // truncated tag frame: parse fails cleanly, never reads past end
    assert(Mp3.parseXing(java.util.Arrays.copyOfRange(vbr, 0, 30)).isEmpty)
  }

  test("corrupt tag and torn payload stay safe: overflowed Xing count " +
    "falls back to the walk; torn first frame still routes as MPEG") {
    val s = Mp3.buildXingStream(3, 1, 2, mono = true, _ => 9, _ => false)
    // frames field sits at header(4) + mono side info(17) + magic(4)
    // + flags(4) = offset 29; overwrite with 0xFFFFFFFF → negative Int
    for (i <- 29 to 32) s(i) = 0xff.toByte
    assert(Mp3.quickInfo(s).isEmpty,
      "an overflowed frame count must fall back to the walk")
    assert(Mp3.streamInfo(s).isDefined, "the walk still works")
    // empty tagged stream is a caller error, not a /0 crash
    intercept[IllegalArgumentException] {
      Mp3.buildXingStream(3, 0, 0, mono = true, _ => 1, _ => false,
        withToc = true)
    }
    // torn mid-first-frame: the strict predicate rejects (no whole
    // frame) but the ROUTING probe still says MPEG
    val torn = java.util.Arrays.copyOfRange(
      Mp3.buildFrame(3, 9, 1, padding = false, mono = true), 0, 10)
    assert(Mp3.parseHeaderAt(torn, 0).isEmpty && !Mp3.isMp3(torn))
    assert(Mp3.looksLikeMpeg(torn))
  }

  test("streamInfo: CBR flag, VBR floor-mean bitrate, duration math") {
    val cbr = Mp3.streamInfo(Mp3.buildStream(3, 1, 4, mono = true,
      _ => 9, i => i % 2 == 0)).get
    assert(cbr.cbr && cbr.bitrateKbps == 128 && cbr.nFrames == 4)
    assert(cbr.sampleRate == 48000 && cbr.nPadded == 2)
    // 4*1152 samples @48k = 96 ms exactly
    assert(cbr.totalSamples == 4608L && cbr.durationMs == 96L)
    // VBR alternating 64/128 -> floor mean 96, cbr=false
    val vbr = Mp3.streamInfo(Mp3.buildStream(3, 1, 4, mono = true,
      i => if (i % 2 == 0) 5 else 9, _ => false)).get
    assert(!vbr.cbr && vbr.bitrateKbps == 96)
    // MPEG-2 header (version bits 10) is not MPEG-1: rejected
    val m2 = Mp3.buildFrame(3, 9, 1, padding = false, mono = true)
    m2(1) = (m2(1) & ~0x08).toByte // clear the version-1 low bit
    assert(Mp3.parseHeaderAt(m2, 0).isEmpty)
    // free-format (brIdx 0) rejected: size not derivable
    val ff = Mp3.buildFrame(3, 9, 1, padding = false, mono = true)
    ff(2) = (ff(2) & 0x0f).toByte
    assert(Mp3.parseHeaderAt(ff, 0).isEmpty)
  }
  test("ID3v2 text frames: v2.3/v2.4 round trip with exact offsets, " +
    "TXXX pairs, padding; frame walk coexists; torn/unsync/v2.2 " +
    "refused cleanly") {
    for (ver <- Seq(3, 4)) {
      val tag = Mp3.buildId3v2(ver,
        Seq("TIT2" -> "A Title", "TPE1" -> "Artist"),
        Seq("src" -> "crawl-7"), padding = 11)
      val fs = Mp3.id3TextFrames(tag)
      assert(fs.map(f => (f.frameId, f.description, f.text)) == Seq(
        ("TIT2", "", "A Title"), ("TPE1", "", "Artist"),
        ("TXXX", "src", "crawl-7")), s"v2.$ver frames")
      // offsets follow the construction arithmetic the t130 oracle
      // rederives: header 10, text-frame stride 10 + 1 + len
      assert(fs(0).offset == 10)
      assert(fs(1).offset == 10 + 11 + "A Title".length)
      assert(fs(2).offset == fs(1).offset + 11 + "Artist".length)
      // the frame walker skips the whole tag (padding included) and
      // the text layer is unaffected by trailing audio
      val full = tag ++ Mp3.buildStream(3, 0, 2, mono = true,
        _ => 9, _ => false)
      assert(Mp3.frames(full).size == 2)
      assert(Mp3.id3TextFrames(full) == fs)
    }
    // v2.4 UTF-8 text (encoding 3) decodes beyond latin1; the same
    // bytes relabeled v2.3 skip the frame (enc 3 undefined there)
    val txt = "caf\u00e9 \u2713"
    val p8 = 3.toByte +: txt.getBytes("UTF-8")
    val fr = "TIT2".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, ((p8.length >> 7) & 0x7f).toByte,
        (p8.length & 0x7f).toByte, 0, 0) ++ p8
    val sz = fr.length
    def head(ver: Byte) = Array[Byte]('I', 'D', '3', ver, 0, 0,
      ((sz >> 21) & 0x7f).toByte, ((sz >> 14) & 0x7f).toByte,
      ((sz >> 7) & 0x7f).toByte, (sz & 0x7f).toByte)
    assert(Mp3.id3TextFrames(head(4) ++ fr).map(_.text) == Seq(txt))
    assert(Mp3.id3TextFrames(head(3) ++ fr).isEmpty)
    // UTF-16-with-BOM (encoding 1) is valid in both versions
    val p16 = 1.toByte +: txt.getBytes("UTF-16")
    val fr16 = "TALB".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, ((p16.length >> 7) & 0x7f).toByte,
        (p16.length & 0x7f).toByte, 0, 0) ++ p16
    val sz16 = fr16.length
    val tag16 = Array[Byte]('I', 'D', '3', 3, 0, 0,
      ((sz16 >> 21) & 0x7f).toByte, ((sz16 >> 14) & 0x7f).toByte,
      ((sz16 >> 7) & 0x7f).toByte, (sz16 & 0x7f).toByte) ++ fr16
    assert(Mp3.id3TextFrames(tag16).map(_.text) == Seq(txt))
    // trailing NULs strip (common v2.3 writer habit)
    val nulTag = Mp3.buildId3v2(3, Seq("TIT2" -> "Name\u0000"))
    assert(Mp3.id3TextFrames(nulTag).head.text == "Name")
    // the BUILDER is lossless beyond latin1: v2.4 switches to
    // encoding 3 (UTF-8) per frame instead of '?'-substituting --
    // 'caf\u00e9' and 'caf?' must NOT collide in dedup keys built
    // from synthesized tags; v2.3 (no UTF-8 encoding) refuses loudly
    val uni = Mp3.buildId3v2(4, Seq("TIT2" -> txt, "TPE1" -> "plain"),
      Seq("src\u00e9" -> "\u2713ok"))
    assert(Mp3.id3TextFrames(uni).map(f => (f.frameId, f.description,
      f.text)) == Seq(("TIT2", "", txt), ("TPE1", "", "plain"),
      ("TXXX", "src\u00e9", "\u2713ok")))
    intercept[IllegalArgumentException] {
      Mp3.buildId3v2(3, Seq("TIT2" -> txt))
    }
    intercept[IllegalArgumentException] {
      Mp3.buildId3v2(3, Nil, Seq("d" -> "\u2713"))
    }
    // torn tag: partial prefix never throws, yields a prefix of the
    // full parse
    val whole = Mp3.buildId3v2(4, Seq("TIT2" -> "tt", "TPE1" -> "aa"))
    for (cut <- 0 to whole.length) {
      val part = Mp3.id3TextFrames(java.util.Arrays.copyOfRange(
        whole, 0, cut))
      assert(Mp3.id3TextFrames(whole).startsWith(part.map(identity)) ||
        part.isEmpty || part == Mp3.id3TextFrames(whole).take(part.size))
    }
    // global unsynchronisation and v2.2 are refused, not half-parsed
    val un = Mp3.buildId3v2(4, Seq("TIT2" -> "x"))
    un(5) = 0x80.toByte
    assert(Mp3.id3TextFrames(un).isEmpty)
    val v22 = Mp3.buildId3v2(4, Seq("TIT2" -> "x"))
    v22(3) = 2
    assert(Mp3.id3TextFrames(v22).isEmpty)
  }
}
