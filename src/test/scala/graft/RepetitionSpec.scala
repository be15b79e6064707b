package graft

import graft.operators.Repetition
import org.apache.spark.sql.functions._

/** repetitionSignals/repetitionFilter semantics: hand-computed counts
  * on crafted docs, degenerate shapes, the zero-shuffle plan contract,
  * and partitioning independence. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def signals(docs: org.apache.spark.sql.DataFrame) =
    Repetition.repetitionSignals(docs, "doc_id", "text")

  test("hand-computed signals on crafted documents") {
    val docs = Seq(
      // 2-grams: "a b","b a","a b","b a","a b" -> top "a b" x3 of 5
      // 5-grams: "a b a b a","b a b a b" -> all distinct (2 grams, 0 dup)
      (1L, "a b a b a b"),
      // all-distinct tokens: top 2-gram count 1, no dups, run 1
      (2L, "u v w x y z"),
      // pure run: 6 tokens of "r" -> 5 identical 2-grams, 2 identical
      // 5-grams (both dup), run 6
      (3L, "r r r r r r"))
      .toDF("doc_id", "text")
    val m = signals(docs).collect()
      .map(r => r.getLong(0) -> r).toMap

    val d1 = m(1L)
    assert(d1.getInt(1) == 6) // n_tokens
    assert(d1.getLong(2) == 1) // max_token_run: alternating
    assert(d1.getLong(3) == 3) // top2_cnt: "a b" x3
    assert(d1.getLong(4) == 0) // dup5_cnt: 2 distinct 5-grams
    assert(d1.getDouble(5) == 0.6) // 3/5
    assert(d1.getDouble(6) == 0.0)

    val d2 = m(2L)
    assert(d2.getLong(2) == 1 && d2.getLong(3) == 1 && d2.getLong(4) == 0)
    assert(d2.getDouble(5) == 0.2) // 1/5

    val d3 = m(3L)
    assert(d3.getLong(2) == 6) // the full run
    assert(d3.getLong(3) == 5) // all five 2-grams identical
    assert(d3.getLong(4) == 2) // both 5-grams identical -> 2 instances
    assert(d3.getDouble(5) == 1.0 && d3.getDouble(6) == 1.0)
  }

  test("short documents: no n-grams means zero counts, zero fractions") {
    val docs = Seq((1L, "solo"), (2L, "two words"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val m = signals(docs).collect().map(r => r.getLong(0) -> r).toMap
    // 1 token: no 2-grams at all
    assert(m(1L).getLong(3) == 0 && m(1L).getDouble(5) == 0.0)
    // 4 tokens: 2-grams exist, 5-grams don't
    assert(m(3L).getLong(3) == 1 && m(3L).getLong(4) == 0 &&
      m(3L).getDouble(6) == 0.0)
    // every doc still yields exactly one row
    assert(signals(docs).count() == 3)
  }

  test("signals plan is exchange-free (pure map stage)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = signals(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"repetitionSignals must not shuffle:\n$plan")
  }

  test("repetitionFilter drops the degenerate docs, keeps schema") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog slept by the door", "keep"),
      (2L, "buy now buy now buy now buy now buy now buy now", "spam"),
      (3L, "a a a a a a a a a a a a a a a a a a a a", "run"))
      .toDF("doc_id", "text", "tag")
    val kept = Repetition.repetitionFilter(docs, "doc_id", "text")
    assert(kept.columns.toSeq == Seq("doc_id", "text", "tag"))
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L))
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"repetitionFilter must not shuffle:\n$plan")
  }

  test("signals are partitioning-independent") {
    val docs = (1L to 40L)
      .map(i => (i, (1L to (i % 7 + 2)).map(j => s"w${j % 3}").mkString(" ")))
      .toDF("doc_id", "text")
    val one = signals(docs.repartition(1)).collect().map(_.toSeq).toSet
    val many = signals(docs.repartition(13)).collect().map(_.toSeq).toSet
    assert(one == many)
  }
}
