package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8-class) embedding quantization — the storage face of
  * ANN at 100 TB: a 64-dim float32 embedding is 256 bytes; its
  * per-dimension min/max-scaled 8-bit code is 64 — a 4× cut on the
  * corpus' largest column before any PQ-style lossy structure, and
  * the form vector stores ship for "scalar quantized" indexes.
  *
  * Everything is exact-arithmetic replayable: bounds are per-dim
  * min/max (comparisons only, no float accumulation), codes are
  * `floor(scaled + 0.5)` clamped to [0, 255] (floor, not round —
  * half-up vs half-even rounding differs across engines; floor is
  * unambiguous), and search scores are INTEGER dot products of codes,
  * so two engines agree bit-for-bit with no ulp argument needed —
  * the t97 oracle replays the whole pipeline.
  *
  * Scale shape: bounds are one narrow partial-aggregated pass
  * (`dims` rows to the driver — bounded, like Lloyd centroids); codes
  * are a row-local projection against broadcast-literal bounds; the
  * quantized dot is a codegen'd builtin fold. Like IVF-PQ here, the
  * bounds are an ASSET: freeze them with the index and encode deltas
  * against the frozen bounds so append never re-reads the corpus. */
object Quantize {

  /** Per-dimension (mins, maxs) over `vecCol` (array of numeric).
    * One groupBy(dim) agg; `dims` rows collect to the driver. NULL
    * vectors are ignored; a dimension never observed (empty corpus
    * slice) gets (0, 0) and encodes to 0. */
  def dimBounds(df: DataFrame, vecCol: String,
      dims: Int): (Seq[Double], Seq[Double]) = {
    val rows = df.filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("__d", "__x")))
      .groupBy("__d")
      .agg(min(col("__x").cast("double")).as("__mn"),
        max(col("__x").cast("double")).as("__mx"))
      .collect()
    val mn = Array.fill(dims)(0.0)
    val mx = Array.fill(dims)(0.0)
    rows.foreach { r =>
      val d = r.getInt(0)
      if (d < dims) { mn(d) = r.getDouble(1); mx(d) = r.getDouble(2) }
    }
    (mn.toSeq, mx.toSeq)
  }

  /** 8-bit codes of `vec` under broadcast-literal bounds:
    * code_i = clamp(floor((x_i − min_i) · 255 / (max_i − min_i) + ½)).
    * Constant dimensions (span 0) encode to 0. Row-local, codegen'd;
    * codes are BIGINT elements so downstream integer dots never
    * overflow (64 dims · 255² ≪ 2⁶³). */
  def encode(vec: Column, mins: Seq[Double], maxs: Seq[Double]): Column = {
    require(mins.size == maxs.size, "one (min, max) pair per dimension")
    val minA = array(mins.map(lit): _*)
    val spanA = array(mins.zip(maxs).map { case (mn, mx) =>
      lit(mx - mn) }: _*)
    transform(vec, (x, i) => {
      val m = get(minA, i)
      val sp = get(spanA, i)
      when(sp > 0,
        least(greatest(
          floor((x.cast("double") - m) * 255.0 / sp + 0.5), lit(0.0)),
          lit(255.0)))
        .otherwise(lit(0.0)).cast("long")
    })
  }

  /** Integer dot product of two code arrays — exact BIGINT fold. */
  def quantizedDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Clip-drift stats under FROZEN bounds — the retrain trigger of
    * the quantization lifecycle (the `ivfCellStats` pattern): bounds
    * freeze as an asset at index build, appended vectors encode
    * against them ([[encode]] takes literal bounds, so append is
    * O(delta) and never re-reads the corpus), and any value OUTSIDE
    * the frozen range clamps — lossy beyond the half-bucket contract.
    * This measures that loss per dimension: (dim, n, n_clip_low,
    * n_clip_high, clip_fraction), so a maintenance loop re-derives
    * bounds and re-encodes when drift crosses its threshold instead
    * of on a guess. One narrow partial-aggregated pass; `dims` rows
    * out. */
  def clipStats(df: DataFrame, vecCol: String, mins: Seq[Double],
      maxs: Seq[Double]): DataFrame = {
    require(mins.size == maxs.size, "one (min, max) pair per dimension")
    val minA = array(mins.map(lit): _*)
    val maxA = array(maxs.map(lit): _*)
    df.filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("__d", "__x")))
      .select(col("__d").cast("long").as("dim"),
        col("__x").cast("double").as("__x"),
        get(minA, col("__d")).as("__mn"),
        get(maxA, col("__d")).as("__mx"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__x") < col("__mn"), 1L).otherwise(0L))
          .as("n_clip_low"),
        sum(when(col("__x") > col("__mx"), 1L).otherwise(0L))
          .as("n_clip_high"))
      .withColumn("clip_fraction",
        round((col("n_clip_low") + col("n_clip_high")) / col("n"), 6))
  }
}
