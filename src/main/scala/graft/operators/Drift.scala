package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift monitoring — Population Stability Index between a
  * baseline snapshot and a current one, the standard "did my corpus
  * distribution move" check run before retraining on a refreshed
  * crawl. PSI = Σ_bins (p − q)·ln(p/q); convention: < 0.1 stable,
  * 0.1–0.25 moderate shift, > 0.25 investigate.
  *
  * Scale shape: each side collapses to ≤ nBins cells map-side before
  * the one narrow shuffle (the corpus never moves); totals come from
  * a single-row aggregate cross-joined back (broadcast). Both sides
  * can be 100 TB — the join is bins × bins.
  */
object Drift {

  /** Fixed-edge bin id: # of edges ≤ x (0 .. edges.size). Fixed edges
    * — not quantiles — are the production shape: the monitor's bins
    * are pinned at install time so week-over-week PSIs compare, and
    * the metric cannot depend on baseline scan order. */
  /** Robust per-group outlier profile: median, MAD (median absolute
    * deviation), and the count of rows outside
    * |x − median| > k · 1.4826 · MAD (1.4826 scales MAD to σ under
    * normality — the standard robust z-score). Medians here are EXACT
    * (`percentile`), which buffers per-group value multiplicities in
    * the aggregation — the oracle-parity form. At 100-TB scale swap
    * the median passes for [[Sketches.quantileProfile]]'s GK sketch
    * (rank error ε, bounded state); the outlier SCAN itself is the
    * same one narrow join either way. Three passes: group medians,
    * group MADs (needs the medians), then the counting scan; the two
    * profile frames are group-cardinality-sized and broadcast. */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valCol: String,
      k: Double = 3.0): DataFrame = {
    val g = groupCols.map(col)
    val med = df.groupBy(g: _*)
      .agg(percentile(col(valCol), lit(0.5)).as("med"))
    val dev = df.join(broadcast(med), groupCols)
      .withColumn("__ad", abs(col(valCol) - col("med")))
    val mad = dev.groupBy(g: _*)
      .agg(percentile(col("__ad"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), groupCols)
      .groupBy((g :+ col("med")) :+ col("mad"): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("__ad") > lit(k * 1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select((g :+ col("med") :+ col("mad") :+ col("n") :+
        col("n_outliers")): _*)
  }

  def numericBin(c: Column, edges: Seq[Double]): Column = {
    require(edges == edges.sorted && edges.distinct.size == edges.size,
      s"edges must be strictly increasing: $edges")
    // NULL values get their own NULL bin (psiOver joins bins
    // null-safely) instead of silently folding into bin 0 with the
    // below-first-edge population — a corpus whose null share moves
    // must surface in its own cell.
    when(c.isNull, lit(null).cast("int")).otherwise(
      edges.foldLeft(lit(0)) { (acc, e) =>
        acc + when(c >= e, 1).otherwise(0)
      })
  }

  /** Per-bin PSI decomposition of a numeric column over fixed
    * `edges`: (bin, n_base, n_cur, psi_term) with psi_term =
    * (p − q)·ln(p/q), shares ε-floored so a bin empty on one side
    * contributes a finite, LARGE term (the alarm) instead of ±∞.
    * Total PSI = sum of terms — kept per-bin so the monitor can name
    * WHICH region of the distribution moved. */
  def psiNumeric(base: DataFrame, cur: DataFrame, col_ : String,
      edges: Seq[Double], eps: Double = 1e-6): DataFrame =
    psiOver(base, cur, numericBin(col(col_), edges).as("bin"), eps)

  /** Categorical PSI: one bin per observed value on EITHER side —
    * a category that appears or vanishes outright surfaces as an
    * ε-floored spike, never a dropped row. */
  def psiCategorical(base: DataFrame, cur: DataFrame, col_ : String,
      eps: Double = 1e-6): DataFrame =
    psiOver(base, cur, col(col_).as("bin"), eps)

  private def psiOver(base: DataFrame, cur: DataFrame, bin: Column,
      eps: Double): DataFrame = {
    val b = base.groupBy(bin).agg(count(lit(1)).as("n_base"))
    val c = cur.groupBy(bin).agg(count(lit(1)).as("n_cur"))
    // Null-safe join key: groupBy keeps NULL as a group, but a plain
    // equi-join never matches NULL to NULL, so an identical null
    // population on both sides would surface as TWO unmatched rows,
    // each eps-floored into a large psi_term — a stable corpus would
    // falsely alarm. <=> lands both sides' null bins in one cell.
    val joined = b.join(c, b("bin") <=> c("bin"), "full_outer")
      .select(coalesce(b("bin"), c("bin")).as("bin"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum("n_base").as("__tb"),
      sum("n_cur").as("__tc"))
    val p = greatest(col("n_base").cast("double") / col("__tb"), lit(eps))
    val q = greatest(col("n_cur").cast("double") / col("__tc"), lit(eps))
    joined.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_base"), col("n_cur"),
        ((p - q) * log(p / q)).as("psi_term"))
  }
}
