package graft

import graft.multimodal.Ogg
import org.scalatest.funsuite.AnyFunSuite

/** Ogg page walk: CRC variant, lacing/packet arithmetic, page
  * spanning, Vorbis header metadata, resync on corruption, totality.
  * Pure JVM. */
class OggSpec extends AnyFunSuite {

  private def audio(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((seed + i * 7) % 256).toByte)

  /** A 4-page spec-shaped stream: BOS ident | comment | two audio
    * packets + a spanning start | EOS with the spanning tail. */
  private def stream(serial: Long): Array[Byte] = {
    val ident = Ogg.vorbisIdentPacket(2, 44100L)
    val comment = Ogg.vorbisCommentPacket("graft",
      Seq("TITLE" -> s"doc$serial", "ARTIST" -> "fixture"))
    val a1 = audio(40, 3)
    val a2 = audio(300, 5) // lacing 255 + 45 within one page
    val span = audio(255 + 77, 9) // 255 on page 2, 77 on page 3
    Ogg.page(0x02, 0L, serial, 0L, Seq((ident, true))) ++
      Ogg.page(0x00, 0L, serial, 1L, Seq((comment, true))) ++
      Ogg.page(0x00, 256L, serial, 2L, Seq((a1, true), (a2, true),
        (span.take(255), false))) ++
      Ogg.page(0x05, 384L, serial, 3L, Seq((span.drop(255), true)))
  }

  test("page walk: offsets, flags, granules, lacing, packet counts, CRC") {
    val s = stream(7L)
    val ps = Ogg.pages(s)
    assert(ps.length == 4)
    assert(ps.forall(_.crcOk))
    assert(ps.forall(_.serial == 7L))
    assert(ps.map(_.seq) == Seq(0L, 1L, 2L, 3L))
    assert(ps(0).bos && !ps(0).continued && !ps(0).eos)
    assert(ps(3).eos && ps(3).continued)
    assert(ps.map(_.granule) == Seq(0L, 0L, 256L, 384L))
    // page 2: a1 (40 -> 1 lacing), a2 (300 -> 255+45), span head (255)
    assert(ps(2).nSegments == 4)
    assert(ps(2).payloadLen == 40 + 300 + 255)
    assert(ps(2).nCompletePackets == 2) // span does not complete here
    assert(ps(3).nCompletePackets == 1)
  }

  test("Ogg CRC is the non-reflected 0x04c11db7 variant, not zlib") {
    // "OggS" through the table must differ from java.util.zip.CRC32
    val data = "OggS-crc-probe".getBytes("ISO-8859-1")
    val ogg = Ogg.crc32(data, 0, data.length)
    val z = new java.util.zip.CRC32()
    z.update(data)
    assert(ogg != z.getValue)
    // known property: crc of empty input is 0 (init 0, no xor-out)
    assert(Ogg.crc32(Array.empty[Byte], 0, 0) == 0L)
  }

  test("vorbisIdent and quickInfo: channels, rate, tail granule, duration") {
    val s = stream(3L)
    assert(Ogg.vorbisIdent(s).contains((2, 44100L)))
    val qi = Ogg.quickInfo(s).get
    assert(qi.channels == 2 && qi.sampleRate == 44100L)
    assert(qi.totalSamples == 384L)
    assert(qi.durationMicros == 384L * 1000000L / 44100L)
  }

  test("vorbisComments parse, including a comment packet spanning pages") {
    val s = stream(11L)
    val vc = Ogg.vorbisComments(s).get
    assert(vc.vendor == "graft")
    assert(vc.fields.map(f => (f.field, f.value)) ==
      Seq(("TITLE", "doc11"), ("ARTIST", "fixture")))

    // spanning comment: a vendor long enough to push the packet over
    // one page (first piece must be a multiple of 255)
    val bigComment = Ogg.vorbisCommentPacket("v" * 600,
      Seq("ALBUM" -> "long"))
    val cut = (bigComment.length / 255) * 255
    val s2 = Ogg.page(0x02, 0L, 5L, 0L,
      Seq((Ogg.vorbisIdentPacket(1, 8000L), true))) ++
      Ogg.page(0x00, 0L, 5L, 1L, Seq((bigComment.take(cut), false))) ++
      Ogg.page(0x01, 0L, 5L, 2L, Seq((bigComment.drop(cut), true)))
    val vc2 = Ogg.vorbisComments(s2).get
    assert(vc2.vendor == "v" * 600)
    assert(vc2.fields.map(f => (f.field, f.value)) == Seq(("ALBUM", "long")))
  }

  test("resync: corruption marks that page and never swallows later " +
      "valid pages") {
    val s = stream(9L)
    val ps = Ogg.pages(s)
    val mut = s.clone()
    // flip a payload byte of page 1 -> its CRC fails but structure holds
    mut(ps(1).offset + 30) = (mut(ps(1).offset + 30) ^ 0x7f).toByte
    val walked = Ogg.pages(mut)
    assert(walked.length == 4)
    assert(!walked(1).crcOk && walked.count(_.crcOk) == 3)
    assert(walked.filter(_.crcOk).map(_.seq) == Seq(0L, 2L, 3L))
    // splice page 1's header onto page 2's bytes: whatever the torn
    // capture reports, the CRC-failed extent is not trusted, so the
    // VALID pages behind it all survive the walk
    val cut = s.take(ps(1).offset + 10) ++ s.drop(ps(2).offset)
    val walked2 = Ogg.pages(cut)
    assert(walked2.filter(_.crcOk).map(_.seq) == Seq(0L, 2L, 3L))
  }

  test("totality: truncations and garbage return cleanly") {
    val s = stream(1L)
    for (cut <- 0 until s.length by 53) {
      val ps = Ogg.pages(s.take(cut)) // must not throw
      assert(ps.forall(_.offset < cut))
    }
    assert(Ogg.pages(Array.fill(100)('O'.toByte)).isEmpty)
    assert(Ogg.pages(null).isEmpty)
    assert(Ogg.quickInfo(Array.empty[Byte]).isEmpty)
    assert(Ogg.vorbisComments(audio(500, 1)).isEmpty)
  }

  test("writer rejects illegal spanning pieces") {
    intercept[IllegalArgumentException](
      Ogg.page(0, 0L, 1L, 0L, Seq((audio(100, 1), false))))
  }
}
