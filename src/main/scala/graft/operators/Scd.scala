package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension builders — turning an append-only change
  * stream (the bronze/silver shape: every observed row versioned by a
  * watermark column) into SCD Type-2 validity intervals, the standard
  * warehouse answer to "what did this dimension row look like at time
  * T". The reference pipeline keeps only latest-wins staging
  * (keepLatest, D1/D2); SCD2 is the history-preserving sibling every
  * dimension of record eventually needs (point-in-time joins,
  * as-reported reprocessing).
  *
  * Scale shape: ONE key-shuffle total. The change-detection window
  * and the interval window partition by the same keys, so Catalyst
  * plans a single Exchange followed by two sorts (the second window
  * reuses the first's hash partitioning — ScdSpec pins exactly one
  * exchange in the plan). No driver-side state, no join: a 100-TB
  * change log builds its dimension in one pass.
  */
object Scd {

  /** SCD Type-2 intervals from a change stream.
    *
    * Input: one row per OBSERVATION of the entity (`keys`) at version
    * `versionCol` (a timestamp, load id, or sequence — any totally
    * ordered type; must be unique per key, dedupe upstream with
    * [[Dedup.keepLatest]] if the feed can repeat a version). Output:
    * one row per VALUE EPISODE — consecutive observations whose
    * `tracked` columns are unchanged collapse into one interval:
    *
    *   keys..., tracked..., valid_from, valid_to, is_current
    *
    * `valid_from` = the version that first showed this value;
    * `valid_to` = the version that replaced it (NULL for the open,
    * current episode) — the half-open [from, to) convention, so a
    * point-in-time lookup is `valid_from <= v AND (valid_to IS NULL
    * OR v < valid_to)`. NULL-safe comparison: a tracked column going
    * NULL→'x' or 'x'→NULL is a real change; NULL→NULL is not. */
  def scd2(changes: DataFrame, keys: Seq[String], versionCol: String,
      tracked: Seq[String]): DataFrame = {
    require(keys.nonEmpty && tracked.nonEmpty,
      "scd2 needs at least one key and one tracked column")
    // the temp/output names below silently overwrite same-named input
    // columns (withColumn replaces) — a change stream already carrying
    // e.g. valid_from would corrupt intermediate state, so refuse it
    val reserved =
      Seq("__first", "__chg", "valid_from", "valid_to", "is_current")
    val clash = changes.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with scd2's " +
        "reserved output/temp names — rename them upstream")
    val byKey = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol))
    val changed = tracked
      .map(c => !(col(c) <=> lag(col(c), 1).over(byKey)))
      .reduce(_ || _)
    val episodes = changes
      .withColumn("__first",
        row_number().over(byKey) === 1)
      .withColumn("__chg", col("__first") || changed)
      .filter(col("__chg"))
    episodes
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys.map(col) ++ tracked.map(col) ++ Seq(
        col("valid_from"), col("valid_to"), col("is_current"))): _*)
  }

  /** Point-in-time lookup against an [[scd2]] dimension: the rows
    * valid at version `at` (half-open interval semantics). A plain
    * filter — partition pruning applies if the dimension is stored
    * partitioned by `is_current` or bucketed by key. */
  def asOf(dim: DataFrame, at: Column): DataFrame =
    dim.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || at < col("valid_to")))
}
