package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  test("pageRankFixedPoint: hand-computed 3-node graph, 2 rounds") {
    import spark.implicits._
    // 1→2, 1→3, 2→1; node 3 dangling. scale=1000, damping 85/100:
    //   N=3, base = (1000*15/100)/3 = 50, rank0 = 1000/3 = 333
    //   round 1: node1 = 50 + (333*85) div 100        = 333
    //            node2 = node3 = 50 + (333*85) div 200 = 191
    //   round 2: node1 = 50 + (191*85) div 100        = 212
    //            node2 = node3 = 50 + (333*85) div 200 = 191
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("s", "d")
    val got = Graph.pageRankFixedPoint(edges, "s", "d", iters = 2,
      scale = 1000L).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 212L), (2L, 191L), (3L, 191L)))
  }

  test("pageRankFixedPoint: node set preserved, every rank >= base, " +
    "dangling mass drains total monotonically") {
    import spark.implicits._
    // ring 0→1→…→9→0 plus chords into dangling sinks 100..104
    val edges = ((0 until 10).map(i => (i.toLong, ((i + 1) % 10).toLong)) ++
      (0 until 5).map(i => (i.toLong, (100 + i).toLong))).toDF("s", "d")
    val scale = 1000000000L
    val n = 15L
    val base = (scale * 15L / 100L) / n
    var prevTotal = Long.MaxValue
    for (iters <- Seq(0, 1, 3)) {
      val ranks = Graph.pageRankFixedPoint(edges, "s", "d", iters, scale)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(ranks.map(_._1).sorted.toSeq ==
        ((0L until 10L) ++ (100L until 105L)).sorted)
      if (iters > 0) assert(ranks.forall(_._2 >= base))
      val total = ranks.map(_._2).sum
      assert(total <= scale && total <= prevTotal)
      prevTotal = total
    }
  }

  test("pageRankFixedPoint: rank concentrates on the hub of a star") {
    import spark.implicits._
    // spokes 1..20 all point at hub 0; hub points back at spoke 1
    val edges = ((1 to 20).map(i => (i.toLong, 0L)) :+ (0L, 1L))
      .toDF("s", "d")
    val ranks = Graph.pageRankFixedPoint(edges, "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(0L) > ranks(1L))
    assert((2 to 20).forall(i => ranks(1L) > ranks(i.toLong)))
    // spokes 2..20 are structurally identical — bit-equal ranks
    assert((2 to 20).map(i => ranks(i.toLong)).distinct.size == 1)
  }

  test("pageRankFixedPoint: plan is join+agg per round, no cartesian") {
    import spark.implicits._
    val edges = (0 until 100).map(i => (i.toLong, ((i * 7 + 1) % 100).toLong))
      .toDF("s", "d")
    val ranks = Graph.pageRankFixedPoint(edges, "s", "d", iters = 1)
    val plan = ranks.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(ranks.filter(col("rank") < 0L).count() == 0)
  }
}
