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

  /** PARAGRAPH-level corpus dedup — the Dolma/FineWeb recipe that
    * sits between document-level dedup (t01) and token-span removal
    * ([[SpanStats.removeDuplicatedSpans]]): split each document into
    * structural units on `sep`, drop every paragraph that appears in
    * more than `maxDocFreq` DISTINCT documents (all copies go —
    * keep-first would depend on corpus order), and rebuild the
    * survivors in original order. Within-document repetition is out
    * of scope by construction (distinct-doc counting), as in t53.
    *
    * Output: (idCol, cleaned, n_removed); fully-boilerplate documents
    * come out as empty strings for downstream length filters.
    *
    * Scale shape: paragraphs cross the dedup shuffle as 32-char md5
    * hashes, never text; the doc-frequency pass aggregates distinct
    * (doc, hash) pairs; the common set joins back by hash (AQE splits
    * hot boilerplate hashes); rebuild is one id-keyed groupBy whose
    * array_sort is row-local. Corpus text shuffles exactly once, in
    * the rebuild's (id, pid, para) rows — unavoidable, since the
    * output IS reassembled text. */
  def dedupParagraphs(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", maxDocFreq: Int = 1): DataFrame = {
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    // split(null) explodes to zero rows, which would DROP the doc
    // from the output entirely — surface null-text docs as ("", 0)
    // instead (the same contract as a fully-boilerplate doc)
    val ids = docs.select(col(idCol))
    val paras = docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))))
      .toDF(idCol, "__pid", "__para")
      .withColumn("__h", md5(col("__para")))
    val common = paras.select(col(idCol), col("__h")).distinct()
      .groupBy("__h").agg(count(lit(1)).as("__dc"))
      .filter(col("__dc") > maxDocFreq)
      .select("__h")
    val kept = paras.join(common, Seq("__h"), "left_anti")
    val totals = paras.groupBy(col(idCol))
      .agg(count(lit(1)).as("__np"))
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("__nk"),
        array_join(transform(
          array_sort(collect_list(struct(col("__pid"), col("__para")))),
          s => s("__para")), sep).as("cleaned"))
    ids.join(totals, Seq(idCol), "left")
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cleaned"), lit("")).as("cleaned"),
        (coalesce(col("__np"), lit(0L)) -
          coalesce(col("__nk"), lit(0L))).as("n_removed"))
  }
}
