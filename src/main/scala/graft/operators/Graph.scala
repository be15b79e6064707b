package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-iteration distributed graph algorithms over edge-list
  * DataFrames — the computation class (iterate: join + re-aggregate K
  * times) that link-graph curation signals need. Web-scale training
  * corpora rank domains/documents by link structure (Common-Crawl-style
  * harmonic/PageRank ranks are standard quality priors for sampling
  * weights), and the reference engine has nothing in this class — its
  * analytics stop at one-shot joins/aggregates (reference: the
  * sql/analytics views are all single-pass).
  *
  * Everything here is fixed-point BIGINT arithmetic, NOT floating
  * point, for the same reason [[Pca.moments]] floors scaled products:
  * integer sums are associative, so the result is bit-identical no
  * matter how Spark partitions the sum and bit-identical to a serial
  * SQL engine replaying the same formula — which is what lets a
  * DuckDB oracle pin a distributed 3-iteration PageRank to the exact
  * BIGINT. (Float PageRank differs in the last ulps per partitioning;
  * an "approximately equal" gate would hide real bugs under the
  * tolerance.)
  */
object Graph {

  /** PageRank with damping `dampNum/dampDen` for `iters` rounds, all
    * arithmetic in BIGINTs scaled by `scale`:
    *
    *   base     = (scale * (dampDen - dampNum) / dampDen) / N
    *   rank_0   = scale / N
    *   rank_i+1(v) = base + Σ_{u→v} (rank_i(u) * dampNum)
    *                               div (dampDen * outdeg(u))
    *
    * (all divisions integer-floor; every operand non-negative so
    * Spark's truncating `div` and DuckDB's flooring `//` agree).
    * Dangling nodes (no out-edges) DROP their damped mass rather than
    * redistributing it — the deterministic choice; total rank therefore
    * shrinks monotonically toward `N * base` as dangling mass drains,
    * which the spec pins. Rank floors lose < 1 ulp-of-scale per edge
    * per round: pick `scale` ≫ N · maxdeg (1e9 default) so ranking
    * order is unaffected.
    *
    * Scale shape: `edges` is hash-partitioned on `src` ONCE and
    * persisted; each round then costs one shuffle of the (node, rank)
    * frame — N rows, two longs — to the edge partitioning plus one
    * groupBy(dst) re-aggregation with map-side partial sums. The edge
    * corpus itself (the 100-TB side) never moves after the initial
    * partition. Ranks persist per round (and unpersist the previous
    * round) so lineage stays O(1) deep regardless of `iters`.
    *
    * Returns (node LONG, rank LONG) for every node in src ∪ dst.
    */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 0 && dampNum > 0 && dampNum < dampDen)
    val spark = edges.sparkSession
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .repartition(col("src")) // pay the edge shuffle once, not per round
      .persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().persist()
    val n = nodes.count() // bounded driver scalar (one long)
    require(n > 0, "pageRank on an empty edge set")
    val base = (scale * (dampDen - dampNum) / dampDen) / n

    // Round state is re-rooted at its own execution RDD each
    // iteration (GraftPlanBridge.flatten): with nested logical plans
    // the optimizer re-analyzes one full copy of every previous round
    // per iteration, so plan size — and per-round planning time —
    // grew superlinearly with `iters` (21k-line plan at 3 rounds).
    // The flat form keeps each round's plan O(1) while recompute of a
    // lost cache block still runs through the original lineage (the
    // wrapped RDD IS the persisted plan's execution RDD — see the
    // recoverability note below; this is NOT a localCheckpoint).
    var ranksCached = nodes.withColumn("rank", lit(scale / n)).persist()
    ranksCached.count() // materialize before the loop truncates lineage
    var ranks = org.apache.spark.sql.GraftPlanBridge.flatten(ranksCached)
    for (_ <- 0 until iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"),
          expr(s"(rank * $dampNum) div ($dampDen * deg)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_mass"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("in_mass"), lit(0L))).as("rank"))
        .persist()
      next.count() // force so the previous round can release
      ranksCached.unpersist()
      ranksCached = next
      ranks = org.apache.spark.sql.GraftPlanBridge.flatten(next)
    }
    // Release the loop-scoped caches NOW (e is the corpus-sized one)
    // instead of leaking pinned storage for the rest of the session.
    // The returned ranks stay persisted — already materialized by the
    // count() above, and N (node, rank) rows, not corpus-sized — and
    // keep their full lineage, so losing an executor's blocks
    // recomputes them (a localCheckpoint would truncate lineage onto
    // non-replicated executor-local blocks: unrecoverable under
    // dynamic allocation / spot loss). Callers unpersist when done.
    e.unpersist()
    deg.unpersist()
    nodes.unpersist()
    ranks
  }
}
