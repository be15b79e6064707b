package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-scale retrieval scoring: BM25 keyword relevance and
  * reciprocal-rank fusion of heterogeneous rankings — the hybrid
  * (lexical + vector) search stack a RAG/training-data platform runs
  * over its document store. The reference engine's search surface is
  * plain SQL LIKE filters; BM25/RRF is the scale-path replacement.
  *
  * Oracle parity: every per-term score is a fixed expression tree over
  * exactly-representable doubles (counts, 0.25/0.75-style binary
  * fractions), summed LEFT-ASSOCIATIVELY in declared term order, so
  * DuckDB replaying the same chain reproduces the double bit-for-bit
  * except for `ln` (engines may differ in the last ulp) — scores are
  * therefore rounded to 6 dp before any ordering, with id tie-breaks,
  * the same contract as [[Keywords.tfidfTopK]].
  */
object Retrieval {

  /** BM25 score of every document against a literal query term set:
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
    *   idf(t)   = ln((n − df + 0.5) / (df + 0.5) + 1)
    *
    * Scale shape: TWO corpus passes, each shuffle-free — one for the
    * corpus statistics (n, Σdl, per-term df collapse to a SINGLE row
    * map-side, a |terms|+2-column aggregate; no token instance ever
    * shuffles), one for the scoring projection against the broadcast
    * stats row. Per-document term frequencies are row-local array
    * filters. Nothing about the corpus side grows with |terms|, and
    * nothing shuffles at all: (scan → agg(1 row)) then (scan →
    * broadcast-cross → project). Callers scoring MANY query sets
    * against one corpus should persist the tokenized frame upstream
    * and pass that in — the operator deliberately does not cache
    * (an operator-owned persist would outlive the call and pin
    * executor storage, the Graph.pageRank lesson).
    *
    * Output: (idCol, bm25 DOUBLE rounded 6 dp). Not filtered or
    * ordered — compose with top-k or [[rrf]] downstream.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.25,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty)
    val toks = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))
      .withColumn("dl", size(col("tk")).cast("double"))
    val aggs = Seq(count(lit(1)).cast("double").as("n"),
      sum(col("dl")).as("sumdl")) ++
      queryTerms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("tk"), t), 1d).otherwise(0d))
          .as(s"df_$i")
      }
    val stats = toks.agg(aggs.head, aggs.tail: _*)
    val avgdl = col("sumdl") / col("n")
    val termScores = queryTerms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("tk"), x => x === lit(t))).cast("double")
      val idf = log((col("n") - col(s"df_$i") + lit(0.5)) /
        (col(s"df_$i") + lit(0.5)) + lit(1.0))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / avgdl)))
    }
    toks.crossJoin(broadcast(stats))
      .select(col(idCol),
        round(termScores.reduceLeft(_ + _), 6).as("bm25"))
  }

  /** Reciprocal-rank fusion of rank columns: Σ 1/(k + rank). Ranks are
    * integers, so the fused double is bit-exact on any engine — the
    * reason RRF beats score-interpolation for cross-engine/heterogeneous
    * rankers (scores need calibration; ranks don't). k=60 is the
    * constant from the original Cormack/Clarke/Buettcher formulation. */
  def rrf(k: Int, ranks: Column*): Column = {
    require(k > 0 && ranks.nonEmpty)
    ranks.map(r => lit(1.0) / (lit(k.toDouble) + r)).reduceLeft(_ + _)
  }
}
