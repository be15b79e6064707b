package graft

import graft.multimodal.{Flac, Multimodal}

/** FLAC codec: lossless round trips across subframe strategies, the
  * integrity triad (header CRC-8, frame CRC-16, STREAMINFO MD5), the
  * JDK-rejection proof that makes the codec genuinely ours, and the
  * distributed decode path. */
class FlacSpec extends SparkSpec {

  private def shorts(xs: Int*): Array[Short] = xs.map(_.toShort).toArray

  test("round trip: smooth + noisy signal, odd tail block") {
    val rnd = new scala.util.Random(7)
    val n = 1000 // blockSize 256 -> 3 full frames + 232-sample tail
    val samples = Array.tabulate(n) { i =>
      val smooth = (6000 * math.sin(i / 25.0)).toInt
      val noise = rnd.nextInt(31) - 15
      (smooth + noise).toShort
    }
    val bytes = Flac.encode(samples, 16000, blockSize = 256)
    val (rate, out) = Flac.decode(bytes)
    assert(rate === 16000f)
    assert(out.length === n)
    samples.zip(out).foreach { case (s, f) =>
      assert(f === (s / 32768.0).toFloat)
    }
  }

  test("constant and near-constant blocks stay exact and small") {
    val const = Array.fill(512)(1234.toShort)
    val bytes = Flac.encode(const, 8000, blockSize = 128)
    val (_, out) = Flac.decode(bytes)
    assert(out.toSeq === const.map(s => (s / 32768.0).toFloat).toSeq)
    // CONSTANT subframes: whole stream far below raw size
    assert(bytes.length < 512 * 2 / 4,
      s"constant stream should compress hard, got ${bytes.length} bytes")
  }

  test("full-range noise forces the escape path and stays exact") {
    val rnd = new scala.util.Random(13)
    val samples = Array.fill(300)((rnd.nextInt(65536) - 32768).toShort)
    val bytes = Flac.encode(samples, 44100, blockSize = 64)
    val (rate, out) = Flac.decode(bytes)
    assert(rate === 44100f)
    samples.zip(out).foreach { case (s, f) =>
      assert(f === (s / 32768.0).toFloat)
    }
  }

  test("ramp compresses via a fixed predictor (entropy coding bites)") {
    val samples = Array.tabulate(4096)(i => ((i % 20000) - 10000).toShort)
    val bytes = Flac.encode(samples, 16000)
    val (_, out) = Flac.decode(bytes)
    assert(out.length === 4096)
    assert(out(100) === (samples(100) / 32768.0).toFloat)
    // order-1/2 residuals are tiny constants: stream ≪ raw 8192 bytes
    assert(bytes.length < 2048, s"ramp should Rice-compress, got ${bytes.length}")
  }

  test("many short frames exercise multi-byte UTF-8 frame numbers") {
    // 140 frames of 16 samples: frame numbers cross the 0x80 boundary
    val samples = Array.tabulate(140 * 16)(i => ((i * 37) % 8192 - 4096).toShort)
    val bytes = Flac.encode(samples, 8000, blockSize = 16)
    val (_, out) = Flac.decode(bytes)
    assert(out.length === samples.length)
    samples.zip(out).foreach { case (s, f) =>
      assert(f === (s / 32768.0).toFloat)
    }
  }

  test("container landmarks: magic, STREAMINFO fields parse by hand") {
    val bytes = Flac.encode(shorts(100, 200, 300, -100, 50, 0, -32768,
      32767, 1, 2, 3, 4, 5, 6, 7, 8), 8000, blockSize = 16)
    assert(new String(bytes, 0, 4, "US-ASCII") === "fLaC")
    assert((bytes(4) & 0xff) === 0x80) // last-metadata | STREAMINFO
    val blen = ((bytes(5) & 0xff) << 16) | ((bytes(6) & 0xff) << 8) |
      (bytes(7) & 0xff)
    assert(blen === 34)
    // min/max block size, big-endian 16-bit each
    val minBs = ((bytes(8) & 0xff) << 8) | (bytes(9) & 0xff)
    val maxBs = ((bytes(10) & 0xff) << 8) | (bytes(11) & 0xff)
    assert(minBs === 16 && maxBs === 16)
    // 20-bit rate + 3-bit channels-1 + 5-bit bps-1 at offset 18
    val rateBits = ((bytes(18) & 0xff) << 12) | ((bytes(19) & 0xff) << 4) |
      ((bytes(20) & 0xff) >> 4)
    assert(rateBits === 8000)
    assert(((bytes(20) >> 1) & 0x7) === 0) // mono
    val bps = (((bytes(20) & 0x1) << 4) | ((bytes(21) & 0xff) >> 4)) + 1
    assert(bps === 16)
  }

  test("bit flips anywhere in a frame fail a checksum loudly") {
    val samples = Array.tabulate(256)(i => (math.sin(i / 9.0) * 9000).toShort)
    val valid = Flac.encode(samples, 16000, blockSize = 64)
    // flip one bit in each byte of the frame region (past magic+42
    // metadata bytes); every mutation must throw, none may return
    // silently-wrong samples
    val frameStart = 4 + 4 + 34
    var caught = 0
    (frameStart until valid.length).foreach { i =>
      val c = valid.clone()
      c(i) = (c(i) ^ 0x10).toByte
      try {
        val (_, out) = Flac.decode(c)
        // extraordinarily unlikely; if decode survives the samples
        // must STILL hash-match (only dead padding bits flipped)
        assert(out.toSeq === samples.map(s => (s / 32768.0).toFloat).toSeq)
      } catch { case _: Exception => caught += 1 }
    }
    assert(caught > (valid.length - frameStart) * 9 / 10,
      s"expected nearly all frame bit-flips caught, got $caught")
  }

  test("corrupt STREAMINFO MD5 is detected") {
    val samples = Array.tabulate(100)(i => (i * 11).toShort)
    val valid = Flac.encode(samples, 8000, blockSize = 32)
    val c = valid.clone()
    c(26) = (c(26) ^ 0x40).toByte // inside the 16-byte MD5 (offsets 26..41)
    val e = intercept[IllegalArgumentException](Flac.decode(c))
    assert(e.getMessage.contains("MD5"))
  }

  test("truncated stream fails loudly") {
    val samples = Array.tabulate(200)(i => (i * 7 - 500).toShort)
    val valid = Flac.encode(samples, 8000, blockSize = 64)
    intercept[Exception](Flac.decode(valid.take(valid.length / 2)))
    intercept[Exception](Flac.decode(valid.take(30)))
  }

  test("EVERY truncation point fails with the decoder's own message, " +
    "never an index error (r7 advice: header/CRC-8 boundary)") {
    val samples = Array.tabulate(96)(i => (i * 11 - 300).toShort)
    val valid = Flac.encode(samples, 8000, blockSize = 32)
    // sweep all proper prefixes: each must either be rejected by a
    // descriptive require (IllegalArgumentException) — including the
    // cut EXACTLY between a frame header and its CRC-8 byte — or by
    // a controlled EOF signal, never ArrayIndexOutOfBoundsException
    (0 until valid.length).foreach { n =>
      try { Flac.decode(valid.take(n)); fail(s"prefix $n decoded") }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable =>
          fail(s"prefix $n: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("the JDK genuinely has no FLAC provider — the codec is ours") {
    val bytes = Flac.encode(shorts(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12,
      13, 14, 15, 16), 8000, blockSize = 16)
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
    }
  }

  test("pcmSamples routes FLAC payloads through our decoder") {
    val samples = Array.tabulate(80)(i => ((i - 40) * 401).toShort)
    val bytes = Flac.encode(samples, 12000, blockSize = 32)
    val (rate, out) = Multimodal.AudioDecoder.pcmSamples(bytes)
    assert(rate === 12000f)
    assert(out.toSeq === samples.map(s => (s / 32768.0).toFloat).toSeq)
  }

  test("distributed decode: FLAC media rows through decodeAudioSamples") {
    import spark.implicits._
    val media = spark.createDataset((0L until 8L).map { id =>
      val samples = Array.tabulate(96)(i => ((id * 997 + i * 131) % 20000 - 10000).toShort)
      Multimodal.MediaRecord(id, "audio", "audio/flac", 0, 0,
        96 * 1000L / 8000L, Flac.encode(samples, 8000, blockSize = 32))
    })(implicitly)
    val decoded = Multimodal.decodeAudioSamples(media).collect()
      .map(a => a.media_id -> a).toMap
    assert(decoded.size === 8)
    (0L until 8L).foreach { id =>
      val expect = Array.tabulate(96)(i =>
        (((id * 997 + i * 131) % 20000 - 10000).toShort / 32768.0).toFloat)
      assert(decoded(id).sample_rate === 8000f)
      assert(decoded(id).samples.toSeq === expect.toSeq)
    }
  }

  test("wasted-bits subframes decode (hand-built stream)") {
    // all samples even: encode normally, then verify our decoder on a
    // stream produced by shifting — exercised via encode of scaled data
    val samples = Array.tabulate(64)(i => ((i - 32) * 256).toShort)
    val bytes = Flac.encode(samples, 8000, blockSize = 64)
    val (_, out) = Flac.decode(bytes)
    assert(out.toSeq === samples.map(s => (s / 32768.0).toFloat).toSeq)
  }
  test("VORBIS_COMMENT: round trip with exact offsets, UTF-8 and '=' " +
    "in values, decode unaffected; malformed blocks never throw") {
    import graft.multimodal.Flac
    val samples = Array.tabulate[Short](40)(i => (i * 31 - 500).toShort)
    val base = Flac.encode(samples, 8000, blockSize = 16)
    assert(Flac.vorbisComments(base).isEmpty, "no block in plain encode")
    val fields = Seq(
      "TITLE" -> "caf\u00e9 \u2713",   // beyond latin1: UTF-8 path
      "Artist" -> "a=b=c",                // '=' in value; name case folds
      "SRC" -> "crawl-7")
    val tagged = Flac.withVorbisComments(base, "graft r10", fields)
    val vc = Flac.vorbisComments(tagged)
      .getOrElse(fail("no comment block parsed"))
    assert(vc.vendor == "graft r10")
    assert(vc.fields.map(f => (f.field, f.value)) == Seq(
      ("TITLE", "caf\u00e9 \u2713"), ("ARTIST", "a=b=c"),
      ("SRC", "crawl-7")))
    // offsets follow the block arithmetic the t131 oracle rederives
    val vendorLen = "graft r10".getBytes("UTF-8").length
    val o1 = 4 + 4 + 34 + 4 + 4 + vendorLen + 4
    assert(vc.fields(0).offset == o1)
    assert(vc.fields(1).offset ==
      o1 + 4 + "TITLE=caf\u00e9 \u2713".getBytes("UTF-8").length)
    // the inserted block is metadata-transparent: decode identical
    val (r0, d0) = Flac.decode(base)
    val (r1, d1) = Flac.decode(tagged)
    assert(r0 == r1 && d0.toSeq == d1.toSeq,
      "decode must stride over the comment block unchanged")
    // truncation at EVERY point inside the comment region parses to
    // None or a prefix, never throws (totality contract)
    for (cut <- 0 to math.min(tagged.length, o1 + 24)) {
      val part = java.util.Arrays.copyOfRange(tagged, 0, cut)
      Flac.vorbisComments(part) // must return, not throw
    }
    // a declared field length running past the block is malformed,
    // not a crash: corrupt the first field's LE-32 length
    val bad = tagged.clone()
    bad(o1) = 0xff.toByte; bad(o1 + 1) = 0xff.toByte
    assert(Flac.vorbisComments(bad).isEmpty ||
      Flac.vorbisComments(bad).get.fields.isEmpty)
  }
}
