package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the standard public recipe
  * (quality gate → language filter → exact dedup → near-dup dedup)
  * composed as ONE operator over a document DataFrame:
  *
  *  1. quality: token count within [minTokens, maxTokens], stopword
  *     ratio <= maxStopRatio (length and boilerplate heuristics);
  *  2. language: stopword-profile langId, docs with no signal ("und")
  *     dropped;
  *  3. exact dedup: one survivor (min id) per canonical fingerprint;
  *  4. near-dup dedup: MinHash-LSH candidates, exact-Jaccard verify,
  *     keep-min-id ([[NearDup.dedupByMinhash]]).
  *
  * Scale shape: stages 1–2 are row-local (whole-stage codegen'd, no
  * shuffle — they prune the corpus BEFORE anything shuffles); stage 3
  * is one narrow shuffle on the 32-char fingerprint; stage 4 is the
  * banded-LSH pipeline. Ordering matters at 100 TB: the cheap filters
  * run first so the expensive signature stage sees only survivors.
  */
object Curate {

  def curate(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 20, maxTokens: Int = 100000,
      maxStopRatio: Double = 0.15,
      neardupThreshold: Double = 0.8): DataFrame = {
    val toks = df.withColumn("__tk", TextOps.tokens(col(textCol)))
    val quality = toks
      .filter(size(col("__tk")).between(minTokens, maxTokens))
      .filter(TextOps.stopwordRatio(col("__tk"), TextOps.StopwordsEn)
        <= maxStopRatio)
      .filter(TextOps.langId(col("__tk")) =!= "und")
      .drop("__tk")
    val exact = quality
      .withColumn("__fp", TextOps.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__fp").orderBy(col(idCol).asc)))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
    NearDup.dedupByMinhash(exact, idCol, textCol, neardupThreshold)
  }
}
