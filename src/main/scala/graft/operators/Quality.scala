package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

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
    * space characters in the text). Native [[graft.expressions.Ngrams]]
    * kernel at sep = "" — same output as the historical slice/zip_with
    * construction, none of its transient arrays. */
  private def charTrigrams(text: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.Ngrams(
        org.apache.spark.sql.GraftColumnBridge.expression(
          split(lower(text), "")), 3, ""))

  /** One reference LM as three small frames (all broadcastable):
    * trigram counts, prefix totals, charset size — column names
    * suffixed so two models can join the same corpus frame. */
  private def lmModel(reference: DataFrame, refTextCol: String,
      suffix: String) = {
    val tris = reference
      .select(explode(charTrigrams(col(refTextCol))).as("__tri"))
      .groupBy("__tri").agg(count(lit(1)).as(s"__c3$suffix"))
    val prefix = tris
      .withColumn("__pre", substring(col("__tri"), 1, 2))
      .groupBy("__pre").agg(sum(s"__c3$suffix").as(s"__c2$suffix"))
    val vocab = reference
      .select(explode(split(lower(col(refTextCol)), "")).as("__ch"))
      .agg(countDistinct(col("__ch")).as(s"__v$suffix"))
    (tris, prefix, vocab)
  }

  /** Per-(doc, trigram) multiplicities — the single corpus pass every
    * scorer shares. */
  private def docTrigrams(docs: DataFrame, idCol: String,
      textCol: String) = docs
    .select(col(idCol), explode(charTrigrams(col(textCol))).as("__tri"))
    .groupBy(col(idCol), col("__tri"))
    .agg(count(lit(1)).as("__n"))
    .withColumn("__pre", substring(col("__tri"), 1, 2))

  /** ln P(c₃|c₁c₂) column under the `suffix` model, for a frame that
    * has joined that model's count tables. */
  private def lp(suffix: String): org.apache.spark.sql.Column =
    log((coalesce(col(s"__c3$suffix"), lit(0L)) + lit(1)).cast("double") /
      (coalesce(col(s"__c2$suffix"), lit(0L)) + col(s"__v$suffix"))
        .cast("double"))

  /** Per-document char-trigram log-likelihood under an LM estimated
    * from `reference`: (idCol, n_trigrams, avg_logprob). Documents
    * shorter than 3 chars have no trigrams and no output row. Higher
    * (closer to 0) = more reference-like; threshold downstream. */
  def charLmScore(docs: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String): DataFrame = {
    val (refTris, refPrefix, vocab) = lmModel(reference, refTextCol, "")
    // corpus pass, then broadcast joins against the trigram and prefix
    // tables; unseen trigrams still need the prefix total when the
    // PREFIX is known, hence the separate prefix join
    docTrigrams(docs, idCol, textCol)
      .join(broadcast(refTris), Seq("__tri"), "left")
      .join(broadcast(refPrefix), Seq("__pre"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__lp", lp(""))
      .groupBy(col(idCol))
      .agg(sum("__n").cast("long").as("n_trigrams"),
        round(sum(col("__lp") * col("__n")) / sum("__n"), 6)
          .as("avg_logprob"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", hashed-n-gram
    * variant at the char-trigram granularity): each document is scored
    * under TWO LMs — one estimated from a TARGET corpus (the
    * distribution you want more of) and one from a RAW reference (the
    * distribution you have) — and the weight is the per-trigram
    * log-likelihood ratio. weight > 0 reads "more target-like than
    * raw-like"; select by threshold or sample ∝ exp(weight)
    * downstream.
    *
    * Output: (idCol, n_trigrams, lp_target, lp_raw, weight, selected)
    * with `selected` = weight ≥ `minWeight`. The per-model scores are
    * rounded exactly like [[charLmScore]] (one rounding point each),
    * so weight ≡ round(score_target − score_raw, 6) of the two
    * published scores.
    *
    * Scale shape: BOTH model tables are charset-bounded broadcasts,
    * and the corpus explodes to (doc, trigram) ONCE — a fused scorer,
    * not two [[charLmScore]] passes (which would price the corpus
    * explode and its shuffle twice). */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      raw: DataFrame, rawTextCol: String,
      minWeight: Double = 0.0): DataFrame = {
    val (tTris, tPrefix, tVocab) = lmModel(target, targetTextCol, "_t")
    val (rTris, rPrefix, rVocab) = lmModel(raw, rawTextCol, "_r")
    docTrigrams(docs, idCol, textCol)
      .join(broadcast(tTris), Seq("__tri"), "left")
      .join(broadcast(tPrefix), Seq("__pre"), "left")
      .join(broadcast(rTris), Seq("__tri"), "left")
      .join(broadcast(rPrefix), Seq("__pre"), "left")
      .crossJoin(broadcast(tVocab))
      .crossJoin(broadcast(rVocab))
      .withColumn("__lp_t", lp("_t"))
      .withColumn("__lp_r", lp("_r"))
      .groupBy(col(idCol))
      .agg(sum("__n").cast("long").as("n_trigrams"),
        round(sum(col("__lp_t") * col("__n")) / sum("__n"), 6)
          .as("lp_target"),
        round(sum(col("__lp_r") * col("__n")) / sum("__n"), 6)
          .as("lp_raw"))
      .withColumn("weight", round(col("lp_target") - col("lp_raw"), 6))
      .withColumn("selected", col("weight") >= minWeight)
  }

  /** Per-document lexical-diversity signals — the vocabulary-richness
    * family of corpus-quality heuristics (template/spam pages reuse a
    * tiny vocabulary; natural prose doesn't):
    *   - `n_tokens`, `n_types` — token and distinct-token counts
    *   - `n_hapax` — types occurring exactly once
    *   - `ttr` — type/token ratio
    *   - `hapax_share` — hapax / types (Baayen's P-ish growth signal)
    *   - `word_entropy` — Shannon entropy of the word distribution,
    *     Σ −p·ln p over types (nats)
    *
    * Scale shape — ZERO SHUFFLE, the [[Repetition]] pattern: the
    * within-document token multiset never needs to aggregate across
    * documents, so instead of explode → groupBy(doc, token) each row
    * sorts its OWN token array and folds it once: on a sorted array
    * equal tokens are adjacent, so type/hapax counts and the entropy
    * terms are a linear run-length scan. The token total is bound in
    * the fold's INITIAL ACCUMULATOR, not referenced from the outer row
    * (the HOF-inlining trap: an outer column in a lambda body
    * re-evaluates per element). Pure map stage at 100 TB.
    *
    * Ratios are exact integer divisions. Entropy accumulates
    * ORDER-FREE in fixed point: each type's term −p·ln p is a pure
    * function of the integer pair (count, N), so it is bit-identical
    * on any engine (t31/t50 ln-parity precedent) — but a plain double
    * SUM of those terms depends on summation order (Spark folds in
    * sorted-run order, an external GROUP BY sums in hash order),
    * which makes round-at-6dp a latent boundary flake. Flooring each
    * term to a ×1e12 BIGINT first (identical floor of an identical
    * double) turns the sum associative-exact; total ≤ ln(types)·1e12
    * ≪ 2⁵³, so the final /1e12 is one exact double op. Rounds to
    * 6 dp at the single final point. Empty documents report zeros. */
  def lexicalDiversity(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // NULL text behaves like empty text (zeros, per the contract
    // above) — unguarded, split(NULL) is NULL and the whole stats
    // struct would go NULL, diverging from the oracle's COALESCE
    val toks = filter(
      coalesce(TextOps.tokens(col(textCol)),
        array().cast("array<string>")),
      x => length(x) > lit(0))
    val nd = (c: org.apache.spark.sql.Column) => c.cast("double")
    // fixed-point term for a finished run of length `run` out of `n`:
    // floor(−p·ln p · 1e12) as BIGINT (order-free summation)
    val runTerm = (run: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column) =>
      floor(-(nd(run) / nd(n)) * log(nd(run) / nd(n)) * lit(1e12))
        .cast("long")
    val stats = aggregate(
      array_sort(toks),
      struct(size(toks).cast("long").as("n"),
        lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("types"), lit(0L).as("hapax"), lit(0L).as("ent")),
      (acc, x) => {
        // x never equals NULL-prev, so `change` is false on the first
        // element and the empty-run flush below never fires early
        val change = acc("prev").isNotNull && (x =!= acc("prev"))
        struct(acc("n").as("n"), x.as("prev"),
          when(x <=> acc("prev"), acc("run") + lit(1L))
            .otherwise(lit(1L)).as("run"),
          (acc("types") + when(change, lit(1L)).otherwise(lit(0L)))
            .as("types"),
          (acc("hapax") + when(change && acc("run") === 1L, lit(1L))
            .otherwise(lit(0L))).as("hapax"),
          (acc("ent") + when(change, runTerm(acc("run"), acc("n")))
            .otherwise(lit(0L))).as("ent"))
      },
      acc => {
        val last = acc("prev").isNotNull // flush the final run
        struct(acc("n").as("n"),
          (acc("types") + when(last, lit(1L)).otherwise(lit(0L)))
            .as("types"),
          (acc("hapax") + when(last && acc("run") === 1L, lit(1L))
            .otherwise(lit(0L))).as("hapax"),
          (acc("ent") + when(last, runTerm(acc("run"), acc("n")))
            .otherwise(lit(0L))).as("ent"))
      })
    docs.select(col(idCol), stats.as("__lx"))
      .select(col(idCol),
        col("__lx.n").as("n_tokens"),
        col("__lx.types").as("n_types"),
        col("__lx.hapax").as("n_hapax"),
        when(col("__lx.n") > 0,
          round(nd(col("__lx.types")) / nd(col("__lx.n")), 6))
          .otherwise(lit(0.0)).as("ttr"),
        when(col("__lx.types") > 0,
          round(nd(col("__lx.hapax")) / nd(col("__lx.types")), 6))
          .otherwise(lit(0.0)).as("hapax_share"),
        round(col("__lx.ent").cast("double") / lit(1e12), 6)
          .as("word_entropy"))
  }
}
