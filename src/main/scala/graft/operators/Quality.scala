package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Language-model quality scoring — the perplexity-proxy filter of
  * public corpus pipelines (CCNet-style): documents are scored by the
  * average log-probability of their character trigrams under a model
  * estimated from a REFERENCE corpus (a known-good slice), and
  * low-probability documents (gibberish, encoding damage, wrong
  * language, boilerplate soup) fall below a threshold the caller
  * picks. A real deployment estimates the LM from a trusted corpus
  * (wiki-like text); the *shape* here is the contract: estimation is
  * one aggregate pass, scoring is a broadcast join — no UDF, no
  * driver-side model object.
  *
  * Model: P(c₃ | c₁c₂) with add-one smoothing over the reference
  * charset (V = distinct chars of the reference):
  *
  *   P = (count(c₁c₂c₃) + 1) / (count(c₁c₂·) + V)
  *
  * where count(c₁c₂·) sums trigram counts by prefix — so the
  * conditional normalizes exactly, and unseen trigrams (including
  * unseen PREFIXES) get a well-defined probability instead of a crash
  * or a zero.
  *
  * Scale shape: the trigram table is bounded by the CHARSET³, not the
  * corpus (printable-text charsets make it thousands of rows) — it
  * broadcasts; the corpus explodes to trigram instances once and
  * aggregates per (doc, trigram) before the join, so the join input
  * is distinct-trigrams-per-doc, not instances. ln is rounded to 6
  * only at the FINAL per-doc average (one rounding point keeps the
  * cross-engine hash stable; the t50 gate proves JVM↔DuckDB ln
  * agreement, as t31 did for TF-IDF).
  */
object Quality {

  /** Positional char trigrams as plain 3-char strings (no separator —
    * single chars are unambiguous, and a separator would collide with
    * space characters in the text). Same slice/zip_with construction
    * as [[TextOps.ngramsRaw]], same reason (lambda bodies touch only
    * element arguments — see its PERF note). */
  private def charTrigrams(text: org.apache.spark.sql.Column) = {
    val chars = split(lower(text), "")
    val m = size(chars) - 2
    val slices = (0 until 3).map(i => slice(chars, lit(i + 1), m))
    when(m >= 1,
      slices.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, y))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-document char-trigram log-likelihood under an LM estimated
    * from `reference`: (idCol, n_trigrams, avg_logprob). Documents
    * shorter than 3 chars have no trigrams and no output row. Higher
    * (closer to 0) = more reference-like; threshold downstream. */
  def charLmScore(docs: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String): DataFrame = {
    // reference pass: trigram counts, prefix totals, charset size
    val refTris = reference
      .select(explode(charTrigrams(col(refTextCol))).as("__tri"))
      .groupBy("__tri").agg(count(lit(1)).as("__c3"))
    val refPrefix = refTris
      .withColumn("__pre", substring(col("__tri"), 1, 2))
      .groupBy("__pre").agg(sum("__c3").as("__c2"))
    val vocab = reference
      .select(explode(split(lower(col(refTextCol)), "")).as("__ch"))
      .agg(countDistinct(col("__ch")).as("__v"))

    // corpus pass: per-(doc, trigram) multiplicities, then broadcast
    // joins against the trigram and prefix tables; unseen trigrams
    // still need the prefix total when the PREFIX is known, hence the
    // separate prefix join
    val docTris = docs
      .select(col(idCol), explode(charTrigrams(col(textCol))).as("__tri"))
      .groupBy(col(idCol), col("__tri"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__pre", substring(col("__tri"), 1, 2))
    docTris
      .join(broadcast(refTris), Seq("__tri"), "left")
      .join(broadcast(refPrefix), Seq("__pre"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__lp",
        log((coalesce(col("__c3"), lit(0L)) + lit(1)).cast("double") /
          (coalesce(col("__c2"), lit(0L)) + col("__v")).cast("double")))
      .groupBy(col(idCol))
      .agg(sum("__n").cast("long").as("n_trigrams"),
        round(sum(col("__lp") * col("__n")) / sum("__n"), 6)
          .as("avg_logprob"))
  }
}
