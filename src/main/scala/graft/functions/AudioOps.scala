package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Windowed audio feature math over a decoded samples column — pure
  * native Column expressions (builtin higher-order functions, zero
  * UDFs), so the per-sample arithmetic rides Catalyst like every other
  * projection in this repo and an external engine can replay it
  * exactly.
  *
  * Reproducibility contract: PCM samples are exact binary fractions
  * (k/2^15 for 16-bit), so x² sums taken in DOUBLE are exact integers
  * scaled by 2^-30 whenever k is bounded by ~2^11 per sample — no
  * floating-point drift, any summation order, either engine. The t64
  * gate leans on exactly this: DuckDB recomputes RMS/ZCR from the
  * same integer sample values and must hash-match.
  */
object AudioOps {

  /** Per-window features over `samplesCol` (array<float>), `nWindows`
    * windows: array of structs (window, n, rms, zcr).
    *
    * Window membership matches [[graft.multimodal.Multimodal.AudioDecoder]]'s
    * segment mapping: sample i belongs to window floor(i·nW/n), i.e.
    * window w covers [ceil(w·n/nW), ceil((w+1)·n/nW)). `rms` is
    * sqrt(Σx²/len) in double; `zcr` counts strict sign flips
    * (xᵢ·xᵢ₊₁ < 0) between consecutive samples INSIDE the window.
    * Empty windows (n < nWindows) emit n=0, rms=0, zcr=0. */
  def windowFeatures(samplesCol: String, nWindows: Int): Column = {
    require(nWindows > 0)
    val c = s"`$samplesCol`"
    def start(w: String) =
      s"CAST((CAST($w AS BIGINT) * size($c) + ${nWindows - 1}) DIV $nWindows AS INT)"
    val s0 = start("w")
    val s1 = start("(w + 1)")
    val seg = s"slice($c, $s0 + 1, $s1 - $s0)"
    expr(
      s"""transform(sequence(0, ${nWindows - 1}), w -> named_struct(
         |  'window', CAST(w AS INT),
         |  'n', $s1 - $s0,
         |  'rms', IF($s1 > $s0,
         |    sqrt(aggregate($seg, CAST(0 AS DOUBLE),
         |      (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
         |      / CAST($s1 - $s0 AS DOUBLE)),
         |    CAST(0 AS DOUBLE)),
         |  'zcr', aggregate($seg,
         |    named_struct('p', CAST(NULL AS DOUBLE), 'c', 0),
         |    (a, x) -> named_struct('p', CAST(x AS DOUBLE),
         |      'c', a.c + IF(a.p IS NOT NULL AND a.p * CAST(x AS DOUBLE) < CAST(0 AS DOUBLE), 1, 0)),
         |    a -> a.c)))""".stripMargin)
  }

  /** 64-bit perceptual audio fingerprint — the audio twin of
    * [[ImageOps.dHash]]: split the clip into 65 windows (same
    * floor(i·W/n) membership as [[windowFeatures]]), compute each
    * window's energy Σx², and set bit w iff energy(w+1) > energy(w) —
    * the energy-envelope gradient-sign pattern, robust to uniform
    * gain-free edits the way dHash is to brightness. Energies are
    * exact (binary-fraction samples — see the class doc), so the
    * comparisons are deterministic in any engine and the t76 gate
    * replays every bit in DuckDB. Clips shorter than 65 samples have
    * empty windows (energy 0); bits involving them still compare
    * deterministically. Bit 63 lands in the sign bit, like every
    * 64-bit signature here — downstream banding uses
    * shiftrightunsigned ([[graft.operators.NearDup.dedupBySignature]]
    * gives the fingerprint the same paired-block banding / hamming
    * verify / smaller-id-wins machinery as text SimHash and image
    * dHash; the t77 gate proves the composed pipeline). */
  def audioFingerprint(samplesCol: String): Column = {
    val c = s"`$samplesCol`"
    val nW = 65
    def start(w: String) =
      s"CAST((CAST($w AS BIGINT) * size($c) + ${nW - 1}) DIV $nW AS INT)"
    val e = s"transform(sequence(0, ${nW - 1}), w -> aggregate(" +
      s"slice($c, ${start("w")} + 1, ${start("(w + 1)")} - ${start("w")}), " +
      "CAST(0 AS DOUBLE), " +
      "(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    // single-element-array transform = let-binding: the 65 energies
    // are computed ONCE, not once per bit comparison
    expr(
      s"""transform(array($e), e ->
         |  aggregate(sequence(0, 63), CAST(0 AS BIGINT),
         |    (acc, i) -> acc + IF(e[i + 1] > e[i],
         |      shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))))[0]"""
        .stripMargin)
  }

  /** Windowed DFT band energies over `samplesCol` (array<float>),
    * `nWindows` windows: array of structs
    * (window, n, e_dc, e_mid, e_high).
    *
    * The DFT is evaluated at the three frequencies whose twiddle
    * factors are EXACT doubles — ω = 0 (DC), fs/4 (cos/sin cycle
    * 1,0,-1,0 / 0,1,0,-1) and fs/2 (Nyquist, (-1)^i) — so the whole
    * computation stays inside the exact-binary-fraction contract of
    * [[windowFeatures]]: sample values are k/2^9-scaled integers,
    * every partial sum and square is an integer multiple of 2^-18
    * far below 2^53, and the single inexact operation per band is
    * the final IEEE division by n² — bit-identical in any engine,
    * any summation order. Band energy is the mean-square amplitude
    * |Σ x·e^(-jωi)|²/n² with i the 0-based offset INSIDE the window
    * (phase restarts per window, as a per-window DFT does).
    * Empty windows emit n=0 and zero energies.
    */
  def spectralBands(samplesCol: String, nWindows: Int): Column = {
    require(nWindows > 0)
    val c = s"`$samplesCol`"
    def start(w: String) =
      s"CAST((CAST($w AS BIGINT) * size($c) + ${nWindows - 1}) DIV $nWindows AS INT)"
    val s0 = start("w")
    val s1 = start("(w + 1)")
    val seg = s"slice($c, $s0 + 1, $s1 - $s0)"
    val z = "CAST(0 AS DOUBLE)"
    val one = "CAST(1 AS DOUBLE)"
    val n = s"($s1 - $s0)"
    val nn = s"(CAST($n AS DOUBLE) * CAST($n AS DOUBLE))"
    expr(
      s"""transform(sequence(0, ${nWindows - 1}), w ->
         |  aggregate($seg,
         |    named_struct('i', 0, 'dc', $z, 'c4', $z, 's4', $z, 'ny', $z),
         |    (a, x) -> named_struct(
         |      'i', a.i + 1,
         |      'dc', a.dc + CAST(x AS DOUBLE),
         |      'c4', a.c4 + CAST(x AS DOUBLE) *
         |        CASE WHEN a.i % 4 = 0 THEN $one
         |             WHEN a.i % 4 = 2 THEN -$one ELSE $z END,
         |      's4', a.s4 + CAST(x AS DOUBLE) *
         |        CASE WHEN a.i % 4 = 1 THEN $one
         |             WHEN a.i % 4 = 3 THEN -$one ELSE $z END,
         |      'ny', a.ny + CAST(x AS DOUBLE) *
         |        IF(a.i % 2 = 0, $one, -$one)),
         |    a -> named_struct(
         |      'window', CAST(w AS INT),
         |      'n', $n,
         |      'e_dc', IF($n > 0, (a.dc * a.dc) / $nn, $z),
         |      'e_mid', IF($n > 0, (a.c4 * a.c4 + a.s4 * a.s4) / $nn, $z),
         |      'e_high', IF($n > 0, (a.ny * a.ny) / $nn, $z))))""".stripMargin)
  }
}
