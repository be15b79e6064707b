package graft

import graft.multimodal.Multimodal
import graft.operators.TarShards

import scala.util.Try

/** Adversarial-input robustness for every hand-written binary parser:
  * random bytes, truncations, and bit-flips of VALID payloads must
  * terminate promptly and either parse or fail with an exception —
  * never hang (the r7 review found a corrupt RIFF length could spin
  * the chunk walk forever) and never return corrupt successes that
  * violate the parser's own contract. Seeded, so a failure replays. */
class CodecFuzzSpec extends SparkSpec {

  private val rnd = new scala.util.Random(0xf02dL)

  private def randomBytes(n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    rnd.nextBytes(a)
    a
  }

  private def mutate(valid: Array[Byte]): Array[Byte] =
    rnd.nextInt(3) match {
      case 0 => // truncate
        java.util.Arrays.copyOfRange(valid, 0,
          rnd.nextInt(valid.length + 1))
      case 1 => // single bit flip
        val c = valid.clone()
        val i = rnd.nextInt(c.length)
        c(i) = (c(i) ^ (1 << rnd.nextInt(8))).toByte
        c
      case _ => // splice garbage into the middle
        val cut = rnd.nextInt(valid.length)
        valid.take(cut) ++ randomBytes(16) ++ valid.drop(cut)
    }

  // valid seeds, one per parser family
  private def validWav = Multimodal.wavPcm16(
    Array.tabulate(64)(i => (i * 100).toShort), 8000)
  private def validUlaw = Multimodal.wavG711(
    Array.tabulate(64)(_.toByte), 8000)
  private def validAdpcm = Multimodal.wavImaAdpcm(
    Array.tabulate(64)(_ % 16), 8000)
  private def validFlac = graft.multimodal.Flac.encode(
    Array.tabulate(64)(i => (i * 313 - 9000).toShort), 8000, blockSize = 16)
  private def validGif = Multimodal.gifAnimated(
    Seq(Array.fill(64)(77), Array.fill(64)(200)), 8, 8)
  private def validAvi = Multimodal.aviMjpeg(
    Seq(Multimodal.solidJpeg(50, 8, 8), Multimodal.solidJpeg(90, 8, 8)),
    8, 8)
  private def validJpeg = graft.multimodal.Jpeg.encodeGray(
    Array.tabulate(256)(i => (i * 13) % 256), 16, 16)
  private def validJpegColor = graft.multimodal.Jpeg.encodeColor420(
    Array.tabulate(768)(i => (i * 7) % 256), 16, 16)
  private def validY4m = Multimodal.y4mVideo(
    Seq(Array.tabulate(64)(i => i * 3), Array.fill(64)(128)), 8, 8)
  private def validTar: Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    // a one-entry archive via the public write path is overkill here;
    // hand-roll header + data + end blocks
    val data = "fuzz payload".getBytes("UTF-8")
    bo.write(TarShards.ustarHeader("f.txt", data.length.toLong, 0L))
    bo.write(data)
    bo.write(new Array[Byte](512 - data.length % 512))
    bo.write(new Array[Byte](1024))
    bo.toByteArray
  }

  private def validMp3 = graft.multimodal.Mp3.buildStream(
    3, 1, 5, mono = true, i => 1 + (i % 14), i => i % 2 == 1)

  test("Mp3.frames: never throws; torn tail, garbage prefix, and " +
    "bit flips cost at most the frames they corrupt") {
    import graft.multimodal.Mp3
    val valid = validMp3
    assert(Mp3.frames(valid).size == 5)
    // torn tail: truncate mid-last-frame -> exactly the 4 whole frames
    val torn = java.util.Arrays.copyOfRange(valid, 0, valid.length - 3)
    assert(Mp3.frames(torn).size == 4)
    // garbage prefix (no 0xff bytes): resync finds every frame
    val prefixed = Array.fill[Byte](7)(0x41) ++ valid
    assert(Mp3.frames(prefixed).size == 5)
    // frames() must TOTAL-FUNCTION every input: mutations and random
    // bytes return (possibly fewer/zero frames), never throw, and
    // every returned frame must lie inside the buffer
    for (_ <- 0 until 40) {
      val payload =
        if (rnd.nextBoolean()) randomBytes(rnd.nextInt(1200))
        else mutate(valid)
      val fs = Mp3.frames(payload) // throwing fails the test
      fs.foreach(f => assert(f.offset >= 0 &&
        f.offset + f.sizeBytes <= payload.length))
      Mp3.streamInfo(payload) // same totality for the stats pass
    }
    // the audio decode path REJECTS MPEG payloads with a routing
    // message instead of an opaque JDK failure
    val e = intercept[IllegalArgumentException] {
      Multimodal.AudioDecoder.pcmSamples(valid)
    }
    assert(e.getMessage.contains("parse-only"))
  }

  test("binary parsers terminate on random and mutated inputs") {
    val parsers: Seq[(String, Array[Byte] => Any)] = Seq(
      "MjpegCodec.frames" -> (b => Multimodal.MjpegCodec.frames(b)),
      "MjpegCodec.firstFrame" -> (b => Multimodal.MjpegCodec.firstFrame(b)),
      "GifCodec.frames" -> (b => Multimodal.GifCodec.frames(b)),
      "Y4mCodec.frames" -> (b => Multimodal.Y4mCodec.frames(b)),
      "AudioDecoder.pcmSamples" ->
        (b => Multimodal.AudioDecoder.pcmSamples(b)),
      "Flac.decode" -> (b => graft.multimodal.Flac.decode(b)),
      "Flac.vorbisComments" ->
        (b => graft.multimodal.Flac.vorbisComments(b)),
      "Multimodal.riffInfoTags" ->
        (b => Multimodal.riffInfoTags(b)),
      "Mp3.frames" -> (b => graft.multimodal.Mp3.frames(b)),
      "Mp3.streamInfo" -> (b => graft.multimodal.Mp3.streamInfo(b)),
      "Mp3.id3TextFrames" ->
        (b => graft.multimodal.Mp3.id3TextFrames(b)),
      "Jpeg.decode" -> (b => graft.multimodal.Jpeg.decode(b)),
      "Jpeg.decodeLuma" -> (b => graft.multimodal.Jpeg.decodeLuma(b)),
      "Mpv.decode" -> (b => graft.multimodal.Mpv.decode(b)),
      "Ogg.pages" -> (b => graft.multimodal.Ogg.pages(b)),
      "Ogg.quickInfo" -> (b => graft.multimodal.Ogg.quickInfo(b)),
      "Ogg.vorbisComments" ->
        (b => graft.multimodal.Ogg.vorbisComments(b)),
      "parseUstar" -> (b => TarShards.parseUstar(b, "fuzz").toList))
    val seeds: Seq[() => Array[Byte]] = Seq(
      () => validWav, () => validUlaw, () => validAdpcm,
      () => validFlac, () => validGif, () => validAvi, () => validY4m,
      () => validTar, () => validMp3,
      () => graft.multimodal.Mp3.buildId3v2(4,
        Seq("TIT2" -> "fuzz title", "TALB" -> "fuzz album"),
        Seq("src" -> "fuzz"), padding = 7) ++ validMp3,
      () => graft.multimodal.Flac.withVorbisComments(validFlac,
        "fuzz vendor", Seq("TITLE" -> "fuzz", "SRC" -> "s=1")),
      () => Multimodal.withRiffInfo(validWav,
        Seq("INAM" -> "fuzz", "ICMT" -> "x")),
      () => validJpeg, () => validJpegColor,
      () => graft.multimodal.Mpv.encode(
        Seq(Array.tabulate(256)(i => i % 251),
          Array.tabulate(256)(i => (i * 3) % 251)), 16, 16,
        Seq(Array((0, 0)))),
      () => graft.multimodal.Ogg.page(0x02, 0L, 1L, 0L,
        Seq((graft.multimodal.Ogg.vorbisIdentPacket(1, 8000L), true))) ++
        graft.multimodal.Ogg.page(0x04, 128L, 1L, 1L,
          Seq((Array.tabulate(60)(i => (i * 7).toByte), true))))
    var ran = 0
    for (_ <- 0 until 60) {
      val payload =
        if (rnd.nextBoolean()) randomBytes(rnd.nextInt(1500))
        else mutate(seeds(rnd.nextInt(seeds.length))())
      for ((_, p) <- parsers) {
        // exceptions are fine (corrupt media quarantines upstream);
        // returning at all is the property under test — a hang fails
        // the suite by timeout
        Try(p(payload))
        ran += 1
      }
    }
    assert(ran == 60 * parsers.size)
  }

  test("mutated-but-valid structures keep parser contracts") {
    // the specific r7 regression: a RIFF chunk length of 0xFFFFFFF8
    // (le32 = -8) must fail, not spin
    val evil = validUlaw.clone()
    // fmt chunk length field sits at offset 16 in a canonical WAV
    evil(16) = 0xf8.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0xff.toByte
    assert(Try(Multimodal.AudioDecoder.pcmSamples(evil)).isFailure)

    val evilAdpcm = validAdpcm.clone()
    evilAdpcm(16) = 0xf8.toByte; evilAdpcm(17) = 0xff.toByte
    evilAdpcm(18) = 0xff.toByte; evilAdpcm(19) = 0xff.toByte
    assert(Try(Multimodal.AudioDecoder.pcmSamples(evilAdpcm)).isFailure)

    // ustar: a flipped size field either still parses (checksum was
    // not covered) or fails — but must never read past the buffer
    val t = validTar.clone()
    t(124) = '7'
    Try(TarShards.parseUstar(t, "evil").toList)

    // FLAC: the integrity triad (CRC-8/CRC-16/MD5) means a mutated
    // stream either FAILS or decodes to exactly the original samples
    // (only dead metadata bits can differ silently)
    val flacOrig = graft.multimodal.Flac.decode(validFlac)._2.toSeq
    for (_ <- 0 until 20) {
      Try(graft.multimodal.Flac.decode(mutate(validFlac))).foreach {
        case (_, out) => assert(out.toSeq == flacOrig,
          "mutated FLAC decoded to different samples without an error")
      }
    }

    // GIF: every successful frame from a mutated payload must still
    // be a decodable PNG (the codec's contract is DECODABLE frames)
    for (_ <- 0 until 10) {
      val frames = Try(Multimodal.GifCodec.frames(mutate(validGif)))
        .getOrElse(IndexedSeq.empty)
      frames.foreach { png =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(png))
        assert(img != null, "GifCodec returned an undecodable frame")
      }
    }

    // Y4M: same decodable-frames contract, plus the torn-tail shape —
    // raw YUV has no resync marker, so truncation mid-frame must lose
    // the TAIL only: surviving frames decode and frame 0 of a
    // body-truncated stream is byte-identical to the intact frame 0
    for (_ <- 0 until 10) {
      val frames = Try(Multimodal.Y4mCodec.frames(mutate(validY4m)))
        .getOrElse(IndexedSeq.empty)
      frames.foreach { png =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(png))
        assert(img != null, "Y4mCodec returned an undecodable frame")
      }
    }
    val intact = Multimodal.Y4mCodec.frames(validY4m)
    assert(intact.length == 2)
    val torn = Multimodal.Y4mCodec.frames(
      validY4m.dropRight(10)) // rips into frame 2's plane bytes
    assert(torn.length == 1)
    assert(torn.head.toSeq == intact.head.toSeq,
      "truncating the tail corrupted an earlier Y4M frame")
  }
}
