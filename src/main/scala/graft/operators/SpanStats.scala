package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Substring-level duplication statistics — the diagnostic behind
  * span-level dedup of training corpora (the public "repeated n-gram"
  * recipe: documents sharing long token spans with the rest of the
  * corpus are near-duplicate or boilerplate-heavy even when whole-doc
  * Jaccard is low). Document-level dedup ([[NearDup]]) misses these;
  * this operator measures them.
  *
  * Scale shape: the corpus explodes to (doc, gram) once and
  * immediately aggregates to per-(doc, gram) multiplicities — span
  * INSTANCES never cross a shuffle, only distinct (doc, gram) rows do.
  * Global gram counts derive from that same aggregated frame (Spark
  * reuses the exchange: the explode is computed once), and the
  * gram-keyed join back is between two already-narrow frames. At
  * 100 TB the gram key is Zipf-skewed (boilerplate spans are hot) —
  * AQE skew-join splits them; counts are map-side combined throughout.
  */
object SpanStats {

  /** Per-document duplicated-span statistics over sliding `n`-token
    * grams: (idCol, n_spans, n_dup_spans, dup_ratio) where a span is
    * duplicated iff its gram occurs at more than one position in the
    * corpus (other documents OR elsewhere in the same document —
    * self-repetition is duplication). Documents with fewer than `n`
    * tokens have no spans and no output row. */
  def duplicatedNgramStats(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val local = df.select(col(idCol),
      explode(TextOps.ngramsRaw(TextOps.tokens(col(textCol)), n))
        .as("gram"))
      .groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("c_local"))
    val global = local.groupBy("gram")
      .agg(sum("c_local").as("c_glob"))
    local.join(global, Seq("gram"))
      .groupBy(col(idCol))
      .agg(
        sum("c_local").as("n_spans"),
        sum(when(col("c_glob") > 1, col("c_local")).otherwise(lit(0L)))
          .as("n_dup_spans"))
      .withColumn("dup_ratio",
        round(col("n_dup_spans") / col("n_spans"), 6))
  }
}
