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

  /** Benchmark decontamination signal: per document, how many sliding
    * `n`-token spans also occur in the BENCHMARK corpus — the standard
    * eval-leakage check before training (a doc sharing long token
    * spans with a test set is contaminated even if globally unique).
    * Output: (idCol, n_spans, n_contaminated, contamination_ratio),
    * ratio 0.0 for span-less docs (they cannot leak).
    *
    * Scale shape: the benchmark's DISTINCT gram set is tiny next to
    * the corpus (eval sets are small by definition) — it broadcasts,
    * so hit-counting is a broadcast semi join on the exploded corpus
    * and the only corpus-wide shuffle is the per-doc count. Total
    * span counts never explode at all (row-local array size). */
  private def benchGramSet(bench: DataFrame, benchTextCol: String,
      n: Int): DataFrame =
    bench.select(
      explode(TextOps.ngramsRaw(TextOps.tokens(col(benchTextCol)), n))
        .as("gram")).distinct()

  private def corpusGrams(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    docs.select(col(idCol),
      explode(TextOps.ngramsRaw(TextOps.tokens(col(textCol)), n))
        .as("gram"))

  /** Shared output assembly: per-doc span totals left-joined with the
    * hit counts, ratio rounded to 6 (span-less docs 0.0, kept). One
    * place so the two contamination variants can never drift on the
    * contract. */
  private def assembleContamination(docs: DataFrame, idCol: String,
      textCol: String, n: Int, hits: DataFrame): DataFrame = {
    val totals = docs.select(col(idCol),
      size(TextOps.ngramsRaw(TextOps.tokens(col(textCol)), n))
        .cast("long").as("n_spans"))
    totals.join(hits, Seq(idCol), "left")
      .withColumn("n_contaminated",
        coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("contamination_ratio",
        when(col("n_spans") > 0,
          round(col("n_contaminated") / col("n_spans"), 6))
          .otherwise(lit(0.0)))
  }

  def contamination(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int): DataFrame = {
    val hits = corpusGrams(docs, idCol, textCol, n)
      .join(broadcast(benchGramSet(bench, benchTextCol, n)),
        Seq("gram"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated"))
    assembleContamination(docs, idCol, textCol, n, hits)
  }

  /** [[contamination]] for the regime where the benchmark gram SET is
    * too large to broadcast as data (a full eval-suite union against a
    * 100 TB corpus): the bench grams compress into a Bloom filter that
    * IS broadcastable (~1.2 GB per 10⁹ grams at 1% fpp vs the grams
    * themselves), the corpus gram stream prunes against it ROW-LOCALLY
    * before anything shuffles, and the exact semi-join — now a shuffle
    * join over the surviving ~fpp fraction — removes the false
    * positives. Bloom filters have false positives only, never false
    * negatives, so the output is bit-identical to [[contamination]] —
    * which is exactly what the t98 oracle pins: pruning is a plan
    * optimization, never a meaning change (the t91 discipline). */
  def contaminationBloomPruned(docs: DataFrame, idCol: String,
      textCol: String, bench: DataFrame, benchTextCol: String, n: Int,
      expectedGrams: Long, fpp: Double = 0.01): DataFrame = {
    // the bench gram DAG feeds TWO consumers — the bloomFilter build
    // (an action inside bloomPrune) and the exact semi-join — so it
    // persists; released via CacheRegistry like every composed
    // operator's shared frame
    val benchGrams = graft.CacheRegistry.track(
      benchGramSet(bench, benchTextCol, n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val pruned = Sketches.bloomPrune(
      corpusGrams(docs, idCol, textCol, n), benchGrams, "gram",
      expectedGrams, fpp)
    val hits = pruned.join(benchGrams, Seq("gram"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated"))
    assembleContamination(docs, idCol, textCol, n, hits)
  }

  /** Cross-document boilerplate REMOVAL (the C4/RefinedWeb span-dedup
    * recipe, applied at token level): every token position covered by
    * an `n`-gram that occurs in at least `minDocs` DISTINCT documents
    * is cut, and the text is rebuilt from the survivors. Distinct-doc
    * counting (not instances) keeps self-repetition out of scope —
    * that is [[graft.operators.Repetition]]'s signal; this operator
    * targets spans shared ACROSS documents (headers, footers, license
    * blocks, templated prose).
    *
    * Output: (idCol, cleaned, n_removed). Fully-boilerplate documents
    * come out as empty strings — downstream length filters drop them.
    *
    * Scale shape: positional grams explode once and aggregate to
    * distinct (doc, gram) before the global distinct-doc count (the
    * t32 discipline: instances never cross a shuffle). The
    * boilerplate gram set is corpus-derived — potentially large, so it
    * joins by gram (AQE splits the Zipf-hot ones), NOT broadcast. Per
    * document the covered positions collapse to ONE array row
    * (bounded by doc length), the join back to the corpus is
    * id-keyed and narrow, and the rebuild is row-local: an indexed
    * `filter` over the token array — the corpus text itself never
    * shuffles. */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String,
      textCol: String, n: Int, minDocs: Int = 2): DataFrame = {
    require(n >= 1 && minDocs >= 2,
      "span length must be >= 1 and minDocs >= 2")
    val posGrams = docs.select(col(idCol),
      posexplode(TextOps.ngramsRaw(TextOps.tokens(col(textCol)), n)))
      .toDF(idCol, "__p", "__gram")
    val boiler = posGrams.select(col(idCol), col("__gram")).distinct()
      .groupBy("__gram").agg(count(lit(1)).as("__dc"))
      .filter(col("__dc") >= minDocs)
      .select("__gram")
    val covered = posGrams
      .join(boiler, Seq("__gram"), "left_semi")
      .groupBy(col(idCol))
      .agg(collect_list(col("__p")).as("__starts"))
      .select(col(idCol),
        array_distinct(flatten(transform(col("__starts"),
          s => sequence(s, s + lit(n - 1))))).as("__cov"))
    docs.join(covered, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__cov").isNull, col(textCol))
          .otherwise(array_join(
            filter(TextOps.tokens(col(textCol)),
              (t, i) => !array_contains(col("__cov"), i)), " "))
          .as("cleaned"),
        // explicit null branch: size(null) is config-dependent
        // (-1 legacy, null ANSI) — neither is the 0 we mean
        when(col("__cov").isNull, lit(0L))
          .otherwise(size(col("__cov")).cast("long"))
          .as("n_removed"))
  }
}
