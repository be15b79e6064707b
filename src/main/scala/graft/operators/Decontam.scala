package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space benchmark decontamination — the semantic
  * complement of [[SpanStats.contamination]]'s n-gram check: a
  * PARAPHRASED eval document shares almost no 5-token spans with its
  * source but sits next to it in embedding space, so eval-leakage
  * screening needs both signals.
  *
  * Scale shape mirrors the n-gram twin: the benchmark side is small by
  * definition, so its (normed) vectors broadcast and the corpus is
  * touched in ONE pass — scoring is a broadcast nested-loop the
  * optimizer keeps row-local, and the only corpus-wide shuffle is the
  * per-document max. The IVF variant prunes the broadcast loop with a
  * trained coarse quantizer: corpus vectors score only against bench
  * vectors probing their cell — at a 10⁹-document corpus with
  * nlist = 1024 and nprobe = 8, ~99% of the pairwise work never
  * happens, at the cost of recall on pairs whose true neighbor lies
  * outside the probed cells (with nprobe = nlist it degenerates to the
  * exact answer — the t43 gate pins that equivalence cross-engine).
  */
object Decontam {

  /** Exact variant: (idCol, max_bench_cos, embedding_contaminated)
    * for every corpus row — max cosine against ANY benchmark vector,
    * flagged at `threshold`; an empty benchmark yields every row with
    * NULL score and `false` (same contract as the IVF variant). Pair
    * cosines round to 6 digits before the max (monotone, so
    * order-free) for cross-engine stability. */
  def embeddingContamination(corpus: DataFrame, idCol: String,
      vecCol: String, bench: DataFrame, benchVecCol: String,
      threshold: Double): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).as("__cv"))
      .withColumn("__cn", VectorOps.norm(col("__cv")))
    val b = bench.select(col(benchVecCol).as("__bv"))
      .withColumn("__bn", VectorOps.norm(col("__bv")))
    val scored = c.crossJoin(broadcast(b))
      .select(col(idCol),
        VectorOps.cosine(col("__cv"), col("__bv"),
          col("__cn"), col("__bn")).as("__cos"))
      .groupBy(col(idCol))
      .agg(max(col("__cos")).as("max_bench_cos"))
    // left join from the corpus side: an EMPTY benchmark (a filter
    // that matched nothing) must yield every corpus row un-flagged,
    // not an empty frame — same contract as the IVF variant, and what
    // keeps fullReport's inner join from silently dropping the corpus
    corpus.select(col(idCol)).join(scored, Seq(idCol), "left")
      .withColumn("embedding_contaminated",
        coalesce(col("max_bench_cos") >= threshold, lit(false)))
  }

  /** IVF-pruned variant: corpus rows score only against bench vectors
    * probing their coarse cell (`nprobe` nearest of `centroids`).
    * Corpus rows whose cell no bench vector probes surface with a NULL
    * `max_bench_cos` and `embedding_contaminated = false` — they had
    * no candidate above the coarse floor. */
  def embeddingContaminationIvf(corpus: DataFrame, idCol: String,
      vecCol: String, bench: DataFrame, benchVecCol: String,
      threshold: Double, centroids: DataFrame, centIdCol: String,
      centVecCol: String, nprobe: Int): DataFrame = {
    require(nprobe >= 1)
    val cells = Ann.ivfAssignCells(corpus, idCol, vecCol,
      centroids, centIdCol, centVecCol).drop("d2")
    val c = corpus.select(col(idCol), col(vecCol).as("__cv"))
      .withColumn("__cn", VectorOps.norm(col("__cv")))
      .join(cells, Seq(idCol))
    // bench is broadcast-small: rank its cells with a plain window
    val bd2 = VectorOps.sqDist(col("__bv"), col(centVecCol))
    val bProbes = bench.select(col(benchVecCol).as("__bv"))
      .withColumn("__bid", monotonically_increasing_id())
      .crossJoin(broadcast(centroids))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__bid")
          .orderBy(bd2.asc, col(centIdCol).asc)))
      .filter(col("__rn") <= nprobe)
      .select(col("__bid"), col("__bv"),
        col(centIdCol).as("cell"))
      .withColumn("__bn", VectorOps.norm(col("__bv")))
    val scored = c.join(broadcast(bProbes), Seq("cell"))
      .select(col(idCol),
        VectorOps.cosine(col("__cv"), col("__bv"),
          col("__cn"), col("__bn")).as("__cos"))
      .groupBy(col(idCol))
      .agg(max(col("__cos")).as("max_bench_cos"))
    corpus.select(col(idCol)).join(scored, Seq(idCol), "left")
      .withColumn("embedding_contaminated",
        coalesce(col("max_bench_cos") >= threshold, lit(false)))
  }

  /** Both leakage signals in one frame: n-gram span overlap
    * ([[SpanStats.contamination]]) joined with embedding proximity —
    * the screening report a training pipeline actually reviews.
    * `docs` must carry text AND embedding columns (pre-joined by the
    * caller); `bench` likewise. */
  def fullReport(docs: DataFrame, idCol: String, textCol: String,
      vecCol: String, bench: DataFrame, benchTextCol: String,
      benchVecCol: String, n: Int, threshold: Double): DataFrame =
    SpanStats.contamination(docs, idCol, textCol, bench, benchTextCol, n)
      .join(embeddingContamination(docs, idCol, vecCol, bench,
        benchVecCol, threshold), Seq(idCol))
      .withColumn("contaminated",
        col("embedding_contaminated") || col("n_contaminated") > 0)
}
