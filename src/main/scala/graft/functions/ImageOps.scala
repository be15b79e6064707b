package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Perceptual-hash math over decoded pixel columns — pure native
  * Column expressions (builtin higher-order functions, zero UDFs),
  * the image twin of [[AudioOps]]: the CODEC (javax.imageio in
  * `graft.multimodal`) is the only per-partition JVM code; everything
  * after the pixels land in an array column rides Catalyst, so an
  * external engine can replay the hash arithmetic bit-for-bit
  * (the t72 gate does exactly that).
  */
object ImageOps {

  /** Canonical 9×8 difference hash (dHash): bit r·8+c is set iff
    * gray[r·9+c+1] > gray[r·9+c] — the horizontal-gradient sign
    * pattern, the classic near-duplicate-image signature (resize any
    * image to 9×8 grayscale first; `Multimodal.ImageResizer` is the
    * real resampler). Integer comparisons only — no float, no
    * rounding, either engine. Input: a 72-element int array column in
    * row-major order; output: the 64-bit signature as a long (bit 63
    * lands in the sign bit, as it does in every 64-bit simhash here —
    * downstream banding uses shiftrightunsigned).
    */
  def dHash(grayCol: String): Column = {
    val g = s"`$grayCol`"
    expr(
      s"""aggregate(sequence(0, 63), CAST(0 AS BIGINT),
         |  (acc, i) -> acc + IF(
         |    $g[(i DIV 8) * 9 + (i % 8) + 1] > $g[(i DIV 8) * 9 + (i % 8)],
         |    shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))"""
        .stripMargin)
  }

  /** 2-D Walsh–Hadamard coefficients of an 8×8 grayscale tile — the
    * pHash family's frequency decomposition with the DCT swapped for
    * its ±1-kernel Walsh–Hadamard cousin, PRECISELY so every
    * coefficient stays an exact integer (a DCT's irrational cosines
    * would put cross-engine bit-equality at libm's mercy; WHT is the
    * standard integer-exact stand-in and ranks global structure the
    * same way). coef[u·8+v] = Σᵢ g[i]·(−1)^(popcount(u & r) +
    * popcount(v & c)) with r = i div 8, c = i mod 8 — the natural-
    * order Hadamard kernel, 64 exact integer sums of 64 terms, all
    * inside one codegen'd builtin expression. Input: 64-element int
    * array, row-major. Output: 64-element long array; coef[0] is
    * 64× the mean (the DC term). */
  def whtCoefs(grayCol: String): Column = {
    val g = s"`$grayCol`"
    expr(
      s"""transform(sequence(0, 63), p ->
         |  aggregate(sequence(0, 63), CAST(0 AS BIGINT),
         |    (acc, i) -> acc + CAST($g[i] AS BIGINT) * IF(
         |      (bit_count((p DIV 8) & (i DIV 8)) +
         |       bit_count((p % 8) & (i % 8))) % 2 = 0,
         |      CAST(1 AS BIGINT), CAST(-1 AS BIGINT))))""".stripMargin)
  }

  /** Perceptual hash over [[whtCoefs]]: bit p (p = 1..63) is set iff
    * AC coefficient p exceeds the lower median (32nd smallest) of
    * the 63 AC coefficients; bit 0 (the DC term — brightness, which
    * a perceptual hash must ignore) is always clear. Pure integer
    * compares against an integer median, so the signature is
    * engine-exact end-to-end (the t105 gate replays it in SQL).
    * Median-thresholding makes the hash invariant to brightness and
    * contrast scaling, the classic pHash robustness dHash lacks —
    * dHash sees local gradients, this sees global structure; the
    * pair disagree exactly where near-dup review wants two opinions.
    * The median is computed ONCE in the fold's initial accumulator,
    * not per bit. */
  /** [[whtHash]]∘[[whtCoefs]] fused into ONE expression with the
    * coefficient array BOUND in the fold's initial accumulator — the
    * composition the hashing pipelines must use. Chaining the two as
    * separate `withColumn`s lets CollapseProject SUBSTITUTE the whole
    * 64×64 coefficient aggregate into every `element_at(cf, …)` of the
    * 63-step hash fold (and any intermediate crop projection into
    * every pixel access below that), turning an O(64²) hash into an
    * O(64⁴)-per-row interpreted cascade — the t109 gate ran HOURS at
    * sf0.01 until this fusion (jstack showed the filter re-evaluating
    * nested ArrayAggregates per row). Here `a.cf`/`a.med` are
    * accumulator FIELDS, evaluated once per row by construction, and
    * the 8×8 tile is read straight off the raw gray column with row
    * stride `stride` (pixel (r,c) = gray[r·stride + c]) so no crop
    * projection exists to substitute. The coefficient expression still
    * appears twice in the init (cf + median) — 2·64² ≈ 8k ops/row,
    * the intended cost. */
  def whtHashFromGray(grayCol: String, stride: Int): Column = {
    require(stride >= 8)
    val g = s"`$grayCol`"
    val cf =
      s"""transform(sequence(0, 63), p ->
         |  aggregate(sequence(0, 63), CAST(0 AS BIGINT),
         |    (acc, i) -> acc +
         |      CAST($g[(i DIV 8) * $stride + (i % 8)] AS BIGINT) * IF(
         |        (bit_count((p DIV 8) & (i DIV 8)) +
         |         bit_count((p % 8) & (i % 8))) % 2 = 0,
         |        CAST(1 AS BIGINT), CAST(-1 AS BIGINT))))""".stripMargin
    expr(
      s"""aggregate(sequence(1, 63),
         |  named_struct(
         |    'cf', $cf,
         |    'med', element_at(array_sort(slice($cf, 2, 63)), 32),
         |    'acc', CAST(0 AS BIGINT)),
         |  (a, p) -> named_struct(
         |    'cf', a.cf,
         |    'med', a.med,
         |    'acc', a.acc + IF(element_at(a.cf, p + 1) > a.med,
         |      shiftleft(CAST(1 AS BIGINT), p), CAST(0 AS BIGINT))),
         |  a -> a.acc)""".stripMargin)
  }

  def whtHash(coefsCol: String): Column = {
    val cf = s"`$coefsCol`"
    expr(
      s"""aggregate(sequence(1, 63),
         |  named_struct(
         |    'med', element_at(array_sort(slice($cf, 2, 63)), 32),
         |    'acc', CAST(0 AS BIGINT)),
         |  (a, p) -> named_struct(
         |    'med', a.med,
         |    'acc', a.acc + IF(element_at($cf, p + 1) > a.med,
         |      shiftleft(CAST(1 AS BIGINT), p), CAST(0 AS BIGINT))),
         |  a -> a.acc)""".stripMargin)
  }
}
