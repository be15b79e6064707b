package graft

import graft.operators.Keywords

/** Keywords.tfidfTopK: IDF discrimination, rank contract. */
class KeywordsSpec extends SparkSpec {

  test("tfidfTopK: rare terms outrank ubiquitous terms of equal tf") {
    import spark.implicits._
    // "common" appears in all 4 docs, "rare" in one — same tf=1 in doc 0
    val docsDf = Seq(
      (0L, "rare common x y"),
      (1L, "common p q r"),
      (2L, "common s t u"),
      (3L, "common v w z")).toDF("id", "text")
    val top = Keywords.tfidfTopK(docsDf, "id", "text", 4)
      .filter($"id" === 0L).collect().sortBy(_.getInt(1))
    val ranked = top.map(r => r.getString(2) -> r.getDouble(3))
    assert(ranked.head._1 == "rare")
    assert(ranked.find(_._1 == "rare").get._2 >
      ranked.find(_._1 == "common").get._2)
    // ranks are 1..k contiguous and scores non-increasing
    assert(top.map(_.getInt(1)).toSeq == Seq(1, 2, 3, 4))
    val scores = top.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("tfidfTopK: k bounds output and result is partitioning-independent") {
    import spark.implicits._
    val docsDf = (0L until 50L)
      .map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} shared"))
      .toDF("id", "text")
    val a = Keywords.tfidfTopK(docsDf, "id", "text", 2)
    assert(a.count() == 100) // 50 docs x k=2
    val b = Keywords.tfidfTopK(docsDf.repartition(11), "id", "text", 2)
    val fmt = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(fmt(a) == fmt(b))
  }
}
