package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Repetition-based quality signals — the Gopher-family heuristics
  * (Rae et al. 2021, "Scaling Language Models", App. A1; reused by
  * MassiveText / RefinedWeb / Dolma): documents dominated by a single
  * repeated phrase, by duplicated n-gram spans, or by long literal
  * token runs are boilerplate/spam and get filtered before training.
  *
  * Signals per document (token-based):
  *   - `top2_frac`  — instances of the modal 2-gram / total 2-grams
  *     (Gopher: "fraction in most common 2-gram", filter > 0.20)
  *   - `dup5_frac`  — instances of 5-grams occurring ≥ 2× / total
  *     5-grams (Gopher: "fraction in duplicate 5-grams")
  *   - `max_token_run` — longest consecutive run of one token
  *     (the "aaaa aaaa aaaa" degenerate docs)
  *
  * Scale shape — ZERO SHUFFLE: every signal is computable inside the
  * row. The within-document n-gram multiset is small (≤ tokens), so
  * instead of the explode → groupBy(doc, gram) shuffle (the t32/t46
  * shape, right when counts must aggregate ACROSS documents), each row
  * sorts its own gram array (`array_sort`) and folds it once with
  * `aggregate`: on a sorted array, equal grams are adjacent, so max
  * multiplicity and duplicated-instance counts are a single linear
  * run-length scan. At 100 TB this is a pure map stage — no exchange,
  * no skew, nothing to spill; RepetitionSpec pins the plan
  * exchange-free. Built-in higher-order functions only, no UDF.
  *
  * The folds stay O(tokens · log tokens) per row (the sort dominates);
  * the gram arrays are built with [[TextOps.ngramsRaw]]'s slice /
  * zip_with construction (see its PERF note for the O(tokens²)
  * optimizer-rewrite trap this avoids).
  */
object Repetition {

  /** Run-length scan of a SORTED array: struct(best, dup) where
    * `best` = max multiplicity of any element and `dup` = number of
    * instances whose element occurs ≥ 2 times. When a run reaches
    * length 2 its first instance is counted retroactively (+2); each
    * further instance adds 1. */
  private def sortedDupStats(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best"), lit(0L).as("dup")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + lit(1L))
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"),
          (acc("dup") + when(run === 2, lit(2L))
            .when(run > 2, lit(1L)).otherwise(lit(0L))).as("dup"))
      },
      acc => struct(acc("best").as("best"), acc("dup").as("dup")))

  /** Longest consecutive run of one element in an UNSORTED array —
    * same scan without the sort (order is the signal here). */
  private def maxRunLen(arr: Column): Column =
    aggregate(
      arr,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + lit(1L))
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  /** Per-document repetition signals:
    * (id, n_tokens, max_token_run, top2_cnt, dup5_cnt, top2_frac,
    * dup5_frac). Documents shorter than n tokens have no n-grams —
    * their counts and fractions are 0. Fractions are rounded to 6 at
    * the single final point (cross-engine hash stability, the t04/t31
    * convention). */
  def repetitionSignals(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val staged = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__tk"))
      .select(col(idCol),
        size(col("__tk")).as("n_tokens"),
        maxRunLen(col("__tk")).as("max_token_run"),
        sortedDupStats(array_sort(TextOps.ngramsRaw(col("__tk"), 2)))
          .as("__s2"),
        sortedDupStats(array_sort(TextOps.ngramsRaw(col("__tk"), 5)))
          .as("__s5"))
    // n-gram totals are arithmetic in n_tokens — no need to size the
    // arrays again. The __s2/__s5 folds are non-cheap expressions
    // referenced twice, so CollapseProject keeps them shared.
    val n2 = greatest(col("n_tokens") - 1, lit(0)).cast("long")
    val n5 = greatest(col("n_tokens") - 4, lit(0)).cast("long")
    staged.select(col(idCol), col("n_tokens"), col("max_token_run"),
      col("__s2")("best").as("top2_cnt"),
      col("__s5")("dup").as("dup5_cnt"),
      when(n2 > 0, round(col("__s2")("best").cast("double") / n2, 6))
        .otherwise(lit(0.0)).as("top2_frac"),
      when(n5 > 0, round(col("__s5")("dup").cast("double") / n5, 6))
        .otherwise(lit(0.0)).as("dup5_frac"))
  }

  /** Keep documents that pass all repetition thresholds. Defaults:
    * top-2-gram 0.20 and duplicate-5-gram 0.15 follow the Gopher
    * cut-offs (ours are token-weighted, the paper's are
    * character-weighted — close but not identical masses);
    * `maxTokenRun` is an extra guard with no Gopher counterpart.
    * Thresholds compare the same 6-digit-rounded fractions
    * [[repetitionSignals]] publishes, so a document classifies
    * identically through either API. Pure map + filter: the predicate
    * is inline on each row — no scratch columns (caller columns can
    * never be clobbered), nothing joined back. */
  def repetitionFilter(docs: DataFrame, idCol: String, textCol: String,
      maxTop2Frac: Double = 0.20, maxDup5Frac: Double = 0.15,
      maxTokenRun: Int = 16): DataFrame = {
    require(maxTop2Frac > 0 && maxDup5Frac > 0 && maxTokenRun >= 1,
      "repetition thresholds must be positive")
    val toks = TextOps.tokens(col(textCol))
    val nTok = size(toks)
    val n2 = greatest(nTok - 1, lit(0)).cast("long")
    val n5 = greatest(nTok - 4, lit(0)).cast("long")
    val s2 = sortedDupStats(array_sort(TextOps.ngramsRaw(toks, 2)))
    val s5 = sortedDupStats(array_sort(TextOps.ngramsRaw(toks, 5)))
    docs.filter(
      (n2 === 0 ||
        round(s2("best").cast("double") / n2, 6) <= maxTop2Frac) &&
      (n5 === 0 ||
        round(s5("dup").cast("double") / n5, 6) <= maxDup5Frac) &&
      maxRunLen(toks) <= maxTokenRun)
  }
}
