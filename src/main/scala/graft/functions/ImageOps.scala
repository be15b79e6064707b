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
}
