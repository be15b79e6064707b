package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-latest / dedup operators (SURVEY.md §2 D1–D5) — THE reference
  * pattern: every gold upsert is preceded by
  *   ROW_NUMBER() OVER (PARTITION BY key ORDER BY loaded_at DESC) = 1
  * (normalize_pipedrive.py:122-133 and 12 more call sites).
  */
object Dedup {

  /** Latest row per key, ordering by `orderCols` descending with the
    * caller expected to make the ordering total (pass a unique
    * tie-break last — nondeterministic keep-latest is how silent
    * flapping between equally-recent versions happens). */
  def keepLatest(df: DataFrame, keys: Seq[String],
      orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Shuffle-light alternative for wide rows: max_by via struct ordering
    * — single aggregate, no window sort. Used when the payload is one
    * column (silver raw rows). `orderCols` compares as a struct
    * (lexicographic), so callers append a unique lineage column as the
    * final element to make the ordering total — same contract as
    * [[keepLatest]]. */
  def keepLatestAgg(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
      payload: String): DataFrame = {
    val carried = (payload +: orderCols).distinct
    val winner = max_by(struct(carried.map(col): _*),
      struct(orderCols.map(col): _*)).as("__w")
    df.groupBy(keys.map(col): _*).agg(winner)
      .select((keys.map(col) ++
        carried.map(c => col(s"__w.$c").as(c))): _*)
  }

  /** Exact duplicate removal on a subset of columns (D4). */
  def distinctOn(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*).distinct()
}
