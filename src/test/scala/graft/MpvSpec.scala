package graft

import graft.multimodal.{Jpeg, Mpv}
import org.scalatest.funsuite.AnyFunSuite

/** Motion-predicted video codec: closed-loop encode/decode round
  * trips, motion-compensation arithmetic, the residual clamp, and
  * decode totality on hostile input. Pure JVM (no Spark session). */
class MpvSpec extends AnyFunSuite {

  private val q = Jpeg.StdQuantLuma

  private def gradient(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h)(i => (seed + (i / w) * 37 + (i % w) * 13) % 251)

  test("I-only round trip matches the JPEG DCT chain block by block") {
    val w = 32; val h = 16
    val f0 = gradient(w, h, 5)
    val bytes = Mpv.encode(Seq(f0), w, h, Seq.empty)
    val v = Mpv.decode(bytes).get
    assert(v.width == w && v.height == h && v.types == Seq('I'))
    // expected: per-8x8-block fdctQuant -> dequantIdct
    for (by <- 0 until h by 8; bx <- 0 until w by 8) {
      val block = Array.tabulate(64)(i => f0((by + i / 8) * w + bx + i % 8))
      val exp = Jpeg.dequantIdct(Jpeg.fdctQuant(block, q), q)
      val got = Array.tabulate(64)(i =>
        v.frames(0)((by + i / 8) * w + bx + i % 8))
      assert(got.toSeq == exp.toSeq, s"block ($bx,$by)")
    }
  }

  test("P-frame decode replays the byte stream exactly: clamp(pred + " +
      "dequantIdct(residual coefs) - 128) per sub-block") {
    val w = 32; val h = 32
    val f0 = gradient(w, h, 9)
    val mv = Array((1, 0), (-2, 1), (0, -1), (-3, -2))
    val bytes = Mpv.encode(Seq(f0, gradient(w, h, 140)), w, h, Seq(mv))
    val v = Mpv.decode(bytes).get
    assert(v.types == Seq('I', 'P'))
    // independent replay from the RAW BYTES: parse each sub-block's
    // 64 coefficients and apply the decode arithmetic by hand
    def i16(o: Int): Int =
      (((bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)).toShort).toInt
    var p = 10 + 1 + (w / 8) * (h / 8) * 128 // skip header + I frame
    assert((bytes(p) & 0xff) == 'P')
    p += 1
    val expect = new Array[Int](w * h)
    for (mb <- 0 until 4) {
      val mx = (mb % 2) * 16
      val my = (mb / 2) * 16
      val dx = bytes(p).toInt
      val dy = bytes(p + 1).toInt
      assert((dx, dy) == mv(mb))
      p += 2
      for (sub <- 0 until 4) {
        val ox = mx + (sub % 2) * 8
        val oy = my + (sub / 2) * 8
        val coefs = Array.tabulate(64)(i => i16(p + 2 * i))
        p += 128
        val rpx = Jpeg.dequantIdct(coefs, q)
        for (i <- 0 until 64) {
          val x = ox + i % 8
          val y = oy + i / 8
          val pr = v.frames(0)((y + dy) * w + (x + dx))
          expect(y * w + x) =
            math.min(255, math.max(0, pr + rpx(i) - 128))
        }
      }
    }
    assert(v.frames(1).toSeq == expect.toSeq)
    // and an unchanged-target zero-motion P frame stays within the
    // quantizer's error envelope of its reference
    val v2 = Mpv.decode(Mpv.encode(Seq(f0, f0), w, h,
      Seq(Array.fill(4)((0, 0))))).get
    val err = v2.frames(1).zip(v2.frames(0))
      .map { case (a, b) => math.abs(a - b) }.max
    assert(err <= 32, s"zero-change P-frame drifted by $err")
  }

  test("motion compensation: a pure translate with matching MV has " +
      "near-zero residual and reconstructs the translated reference") {
    val w = 32; val h = 32
    val f0 = gradient(w, h, 3)
    // every macroblock sources from 8 px left (legal: mbx 1 -> dx -8)
    val mv = Array.tabulate(4)(mb => if (mb % 2 == 1) (-8, 0) else (0, 0))
    val f1 = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val mb = (y / 16) * 2 + x / 16
      val (dx, dy) = mv(mb)
      // target equals what MC of the ENCODER's recon would be only if
      // we build it from f0's recon — use the codec itself to get it
      f0((y + dy) * w + (x + dx))
    }
    val v = Mpv.decode(Mpv.encode(Seq(f0, f1), w, h, Seq(mv))).get
    // the P-frame must equal MC(recon0) + exact-coded residual; since
    // the target was built from f0 (not recon0), assert closeness:
    // every pixel within the quantizer's error envelope
    val recon0 = v.frames(0)
    val pred = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val (dx, dy) = mv((y / 16) * 2 + x / 16)
      recon0((y + dy) * w + (x + dx))
    }
    val err = v.frames(1).zip(pred).map { case (a, b) =>
      math.abs(a - b) }.max
    // residual target - pred is small (quantizer noise only), and the
    // coded residual reproduces it within the same envelope
    assert(err <= 48, s"max |frame1 - MC(frame0)| = $err")
    assert(v.motion(1).toSeq == mv.toSeq)
  }

  test("closed-loop prediction: long GOP does not drift (P-chain of " +
      "identical targets stays pinned to the first reconstruction)") {
    val w = 16; val h = 16
    val f = gradient(w, h, 77)
    val n = 12
    val bytes = Mpv.encode(Seq.fill(n)(f), w, h,
      Seq.fill(n - 1)(Array((0, 0))))
    val v = Mpv.decode(bytes).get
    // with open-loop encoding the quantizer error would COMPOUND over
    // the chain; the closed loop re-encodes each residual vs its own
    // reconstruction, so error vs the constant target stays inside
    // one quantizer envelope and does not grow with GOP length
    val errs = v.frames.map(fr =>
      fr.zip(f).map { case (a, b) => math.abs(a - b) }.max)
    // converging, never compounding: each P refines or holds the
    // error vs the constant target (open loop would grow it)
    for (k <- 1 until n)
      assert(errs(k) <= errs(k - 1),
        s"error grew at frame $k: $errs")
    assert(errs.last <= errs.head, s"closed loop drifted: $errs")
  }

  test("residual clamp: a hard scene cut codes through the [-128,127] " +
      "clamp identically in encoder and decoder") {
    val w = 16; val h = 16
    val black = Array.fill(w * h)(0)
    val white = Array.fill(w * h)(255) // residual +255 -> clamped
    val v = Mpv.decode(Mpv.encode(Seq(black, white), w, h,
      Seq(Array((0, 0))))).get
    // decode must agree with the encoder's own closed-loop recon —
    // totality and determinism, not fidelity, is the contract here
    assert(v.frames(1).forall(p => p >= 0 && p <= 255))
    // and the clamp means the cut is NOT fully reached in one P-frame
    assert(v.frames(1).max <= 230)
  }

  test("frameSignals: types, motion magnitude and residual energy") {
    val w = 32; val h = 16
    val f0 = gradient(w, h, 1)
    val f1 = gradient(w, h, 40)
    val mv = Array((1, 0), (-2, 0))
    val v = Mpv.decode(Mpv.encode(Seq(f0, f1), w, h, Seq(mv))).get
    val sig = Mpv.frameSignals(v)
    assert(sig(0)._2 == "I" && sig(0)._4 == 0L && sig(0)._5 == 0L)
    assert(sig(1)._2 == "P")
    // mean |mv| = (1 + 2) / 2 * 1e6
    assert(sig(1)._4 == 1500000L)
    assert(sig(1)._5 > 0L)
    assert(sig(0)._3 == v.frames(0).map(_.toLong).sum * 1000000L /
      (w * h))
  }

  test("decode totality: hostile and truncated inputs return None") {
    val w = 32; val h = 32
    val good = Mpv.encode(Seq(gradient(w, h, 2), gradient(w, h, 3)),
      w, h, Seq(Array.fill(4)((0, 0))))
    assert(Mpv.decode(good).isDefined)
    // truncations at every 97th byte
    for (cut <- 0 until good.length by 97)
      assert(Mpv.decode(good.take(cut)).isEmpty, s"cut $cut")
    // bad magic
    val bm = good.clone(); bm(0) = 'X'.toByte
    assert(Mpv.decode(bm).isEmpty)
    // dimensions not multiples of 16
    val bd = good.clone(); bd(4) = 17
    assert(Mpv.decode(bd).isEmpty)
    // allocation bomb: 65535x65520 claimed from a tiny stream
    val bomb = good.clone()
    bomb(4) = 0xff.toByte; bomb(5) = 0xff.toByte
    assert(Mpv.decode(bomb).isEmpty)
    // P-frame first (no reference)
    val pf = good.clone(); pf(10) = 'P'.toByte
    assert(Mpv.decode(pf).isEmpty)
    // out-of-bounds motion vector: frame is 32 wide (2 MBs); set MB 0's
    // mvx to -1 (sources at x = -1)
    val ip = 10 + 1 + (w / 8) * (h / 8) * 128 // after I frame, at 'P'
    val oob = good.clone()
    oob(ip + 1) = -1
    assert(Mpv.decode(oob).isEmpty)
    // flipped bytes anywhere must not throw
    for (pos <- Seq(11, 50, 200, good.length - 3)) {
      val mut = good.clone()
      mut(pos) = (mut(pos) ^ 0x5a).toByte
      Mpv.decode(mut) // value unconstrained, must not throw
    }
    assert(Mpv.decode(Array[Byte]()).isEmpty)
    assert(Mpv.decode(null).isEmpty)
  }

  test("frames are multiples of 16 only; encoder rejects others and " +
      "illegal MVs") {
    intercept[IllegalArgumentException](
      Mpv.encode(Seq(Array.fill(8 * 8)(0)), 8, 8, Seq.empty))
    intercept[IllegalArgumentException](
      Mpv.encode(Seq(Array.fill(256)(0), Array.fill(256)(0)), 16, 16,
        Seq(Array((-1, 0)))))
  }
}
