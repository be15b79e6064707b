package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics keyword extraction (TF-IDF) — document
  * fingerprinting for clustering/mixing decisions in a training-data
  * pipeline: which terms characterize each document against the whole
  * corpus.
  *
  * Scale shape: the corpus explodes to (id, token) ONCE and both
  * aggregates derive from it — term frequency is the (id, token)
  * groupBy (map-side combined: per-partition counts shuffle, not token
  * instances), and document frequency is a second groupBy over the
  * ALREADY-AGGREGATED tf frame (one row per (id, token), so
  * count(1) = docs containing the token — the corpus-sized explode is
  * never shuffled twice). The corpus-size scalar rides in as a
  * broadcast 1-row frame, keeping the whole computation one lazy plan.
  * The tf↔df join keys on token and is Zipf-skewed at 100 TB — AQE
  * skew-join splits the hot tokens; a stopword pre-filter
  * ([[Curate.qualityFilter]] upstream) removes most of the mass.
  */
object Keywords {

  /** Top-`k` TF-IDF keywords per document:
    * score = tf · ln((N+1)/(df+1)), rounded to 6, ties on token.
    * Output: (idCol, rank, token, score). */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0)
    val toks = df.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("token"))
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("dfreq"))
    val n = df.agg(count(lit(1)).as("n"))
    tf.join(dfreq, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log((col("n") + 1) / (col("dfreq") + 1)), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(idCol)
          .orderBy(col("score").desc, col("token").asc)))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("token"), col("score"))
  }
}
