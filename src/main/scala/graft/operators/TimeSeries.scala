package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream regularization: turn an irregular per-key event
  * stream into a fixed-interval series — the resample/gap-fill pass
  * every downstream forecasting or drift monitor expects (a day with
  * no events is a ZERO datapoint, not a missing row).
  *
  * Scale shape: the aggregation to (key, slot) is the only pass over
  * the raw stream (map-side partial, one narrow shuffle on the
  * grouping key); the grid explode runs on the AGGREGATED frame
  * (span/interval rows per key, corpus-size-independent) and the
  * LOCF window sorts each key's bounded slot list, never raw events.
  * Skew bound: a key's grid is its observed time span, so a hot key
  * costs span-days rows like every other key.
  */
object TimeSeries {

  /** Daily gap-filled series per key: for each key, every calendar
    * day from its first to its last event carries
    *  - `n_events`   — observed count, 0 on gap days,
    *  - `day_value`  — the day's exact value sum (decimal-summed,
    *                   order-free), NULL on gap days,
    *  - `filled_value` — last observed `day_value` carried forward
    *                   (LOCF). Day one is observed by construction of
    *                   the per-key span, but if its events all carry
    *                   NULL `valCol`, `day_value` — and therefore
    *                   `filled_value` until the first non-NULL day —
    *                   is NULL: LOCF carries observations, it does
    *                   not invent a zero for a day that reported
    *                   "present but valueless". Consumers needing a
    *                   total function should coalesce downstream. */
  def gapFillDaily(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val byDay = df
      .groupBy(col(keyCol), date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valCol).cast("decimal(18,6)")).cast("double")
          .as("day_value"))
    val grid = byDay.groupBy(col(keyCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col(keyCol), explode(sequence(col("__d0"), col("__d1"),
        expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(keyCol).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(byDay, Seq(keyCol, "day"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("filled_value",
        last(col("day_value"), ignoreNulls = true).over(w))
  }
}
