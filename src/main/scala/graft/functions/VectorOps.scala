package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector operators (similarity search, SURVEY.md §7.2.8).
  *
  * All arithmetic is a sequential left-to-right fold over the array —
  * deterministic (no shuffle-order float reassociation), codegen'd, and
  * reproducible bit-for-bit against any engine that sums the same way.
  */
object VectorOps {

  /** Cast a float vector to double once, up front. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two equal-length double vectors.
    * Runs as the native codegen'd [[graft.expressions.DotProduct]]
    * kernel — Spark interprets lambda-bearing HOFs, so the previous
    * `aggregate(zip_with(_*_), 0.0, _+_)` paid per-element dispatch +
    * boxing on every candidate pair; the kernel is bit-identical
    * (same element-order fold, same NULL propagation). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.DotProduct(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** Sequential-fold squared Euclidean distance — fuses the
    * `norm2(zip_with(a, b, _-_))` assignment kernel of the IVF/PQ/
    * k-means family into one native pass (no intermediate difference
    * array, no interpreter). Same fold order and NULL contract. */
  def sqDist(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.SquaredDistance(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** L2 norm (sequential fold). */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Squared L2 norm. */
  def norm2(v: Column): Column = dot(v, v)

  /** Cosine similarity, rounded to `scale` for stable cross-engine
    * ordering (ties then broken on ids by callers). */
  def cosine(a: Column, b: Column, normA: Column, normB: Column,
      scale: Int = 6): Column =
    round(dot(a, b) / (normA * normB), scale)

  /** Deterministic pseudo-random hyperplane weights for LSH: a pure
    * function of (plane, dim) so both engines can embed identical
    * literals — no runtime RNG (reproducible across runs & engines). */
  def lshWeight(plane: Int, dim: Int): Int =
    (((plane * 73856093) ^ (dim * 19349663)) % 1000) - 500

  /** Sign-random-projection LSH signature: `planes` bits, each the sign
    * of v·w(plane). Bucket id fits in an int (planes <= 30). */
  def lshSignature(v: Column, planes: Int, dims: Int): Column = {
    val bits = (0 until planes).map { p =>
      val w = array((0 until dims).map(i => lit(lshWeight(p, i).toDouble)): _*)
      when(dot(v, w) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
