package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bm25: scores equal the formula replayed in plain Scala doubles") {
    import spark.implicits._
    val docsDf = Seq((1L, "a b a"), (2L, "b c"), (3L, "c c c"))
      .toDF("doc_id", "text")
    val got = Retrieval.bm25(docsDf, "doc_id", "text", Seq("a", "c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // mirror the operator's expression tree exactly (same assoc order)
    val (n, sumdl) = (3.0, 8.0)
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def term(df: Double, tf: Double, dl: Double) =
      idf(df) * (tf * 2.25) /
        (tf + 1.25 * (0.25 + 0.75 * (dl / (sumdl / n))))
    def score(tfA: Double, tfC: Double, dl: Double) =
      round6(term(1.0, tfA, dl) + term(2.0, tfC, dl))
    assert(got(1L) == score(2.0, 0.0, 3.0)) // "a b a"
    assert(got(2L) == score(0.0, 1.0, 2.0)) // "b c"
    assert(got(3L) == score(0.0, 3.0, 3.0)) // "c c c"
    // absent query terms contribute exactly zero, not NaN
    assert(got(3L) == round6(term(2.0, 3.0, 3.0)))
  }

  test("bm25: rarer terms out-rank common ones at equal tf") {
    import spark.implicits._
    // 'x' in 1 doc, 'y' in 4 — single-occurrence docs d1 vs d2
    val docsDf = Seq((1L, "x p"), (2L, "y p"), (3L, "y q"), (4L, "y r"),
      (5L, "y s")).toDF("doc_id", "text")
    val got = Retrieval.bm25(docsDf, "doc_id", "text", Seq("x", "y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(2L))
    // identical (tf, dl) docs score bit-identically
    assert(got(2L) == got(3L) && got(3L) == got(4L))
  }

  test("bm25: plan broadcasts the 1-row stats, never shuffles a join") {
    import spark.implicits._
    val docsDf = (0 until 200).map(i => (i.toLong, s"w$i common a b"))
      .toDF("doc_id", "text")
    val plan = Retrieval.bm25(docsDf, "doc_id", "text", Seq("a", "w7"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("rrf: exact reciprocal sums, order-sensitive only through ranks") {
    import spark.implicits._
    val ranks = Seq((1L, 1, 3), (2L, 2, 1), (3L, 3, 2))
      .toDF("id", "r1", "r2")
    val got = ranks.select(col("id"),
      Retrieval.rrf(60, col("r1"), col("r2")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 1.0 / 61.0 + 1.0 / 63.0)
    assert(got(2L) == 1.0 / 62.0 + 1.0 / 61.0)
    assert(got(3L) == 1.0 / 63.0 + 1.0 / 62.0)
  }
}
