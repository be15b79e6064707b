package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash sampling — the mixing/splitting side of a
  * training-data pipeline: corpus mixes ("20% of source A, 5% of B"),
  * train/held-out splits, and subsampled dev sets all need sampling
  * that is (a) reproducible run-to-run, (b) coordinated ACROSS tables
  * (the same id samples in or out everywhere), and (c) row-local —
  * `df.sample()` is none of the three (RNG-seeded per partition, so a
  * repartition changes the sample).
  *
  * The decision function is a salted md5 bucket of the id:
  * `bucket(id) = conv(md5(salt|id)[1..8], 16, 10) mod 10⁶` — a pure
  * projection, so sampling never shuffles, survives any partitioning,
  * pushes down past it, and two engines agree on it bit-for-bit (the
  * t30 gate proves the DuckDB mirror). Changing the salt draws an
  * independent sample; keeping it coordinates samples across tables
  * and runs — at 100 TB, "rerun the mix with one rate changed" touches
  * only the changed stratum's rows.
  */
object Sample {

  /** Buckets per unit of probability: rates are truncated to 10⁻⁶
    * resolution (rate → floor(rate·10⁶) buckets). */
  val Buckets = 1000000L

  /** Salted hash bucket of an id in [0, 10⁶). */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit("|"), id.cast("string"))),
      1, 8), 16, 10).cast("long") % Buckets

  /** Keep each row iff bucket(id) < fraction·10⁶ — a deterministic,
    * partitioning-independent `sample(fraction)`. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      salt: String = "graft"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    df.filter(hashBucket(col(idCol), salt) <
      lit((fraction * Buckets).toLong))
  }

  /** Per-stratum rates (e.g. per language or per source): the rates
    * map becomes a broadcast dimension joined on `stratumCol`, so the
    * corpus side never shuffles; strata absent from the map are
    * DROPPED (rate 0). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], salt: String = "graft"): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0))
    val spark = df.sparkSession
    import spark.implicits._
    val rates = fractions.toSeq.map { case (k, f) =>
      (k, (f * Buckets).toLong)
    }.toDF(stratumCol, "__rate_buckets")
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(hashBucket(col(idCol), salt) < col("__rate_buckets"))
      .drop("__rate_buckets")
  }

  /** Disjoint deterministic splits (train/val/test): adds a `split`
    * column = index into `fractions` by contiguous bucket ranges
    * (split i covers [Σ_{j<i} f_j, Σ_{j<=i} f_j)·10⁶), or -1 for rows
    * past the last boundary when Σ f < 1 (unsampled remainder).
    * Disjointness and coverage are by construction; coordination
    * across tables comes from the shared (salt, id) bucket. */
  def hashSplit(df: DataFrame, idCol: String, fractions: Seq[Double],
      salt: String = "graft"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_ >= 0.0) &&
      fractions.sum <= 1.0 + 1e-9)
    val bounds = fractions.scanLeft(0.0)(_ + _)
      .map(c => (c * Buckets).toLong)
    val b = hashBucket(col(idCol), salt)
    val assigned = fractions.indices.reverse.foldLeft(lit(-1)) {
      (acc, i) => when(b >= bounds(i) && b < bounds(i + 1), lit(i))
        .otherwise(acc)
    }
    df.withColumn("split", assigned)
  }
}
