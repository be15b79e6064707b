package graft

import graft.operators.NearDup
import org.apache.spark.sql.DataFrame

/** Output-equality harness for the witness-search rewrite of
  * `dedupByContainment`: the candidate+verify path must produce the
  * EXACT survivor set the r11 pair-materializing path produced, at
  * the same (tau, maxDf) — the pigeonhole probe budget is claimed
  * complete, so this is an equality assertion, not a recall floor.
  * Corpora are chosen to stress every policy branch: excerpt chains
  * (strict-size drops), near-identical clone families (equal-size
  * min-id ties), hot-gram-capped boilerplate, docs skippable by the
  * uncapped-budget shortcut, and a seeded random soup.
  */
class ContainmentWitnessSpec extends SparkSpec {
  import spark.implicits._

  private def survivors(df: DataFrame, tau: Double, maxDf: Int,
      viaPairs: Boolean): Set[Long] = {
    val out =
      if (viaPairs)
        NearDup.dedupByContainmentViaPairs(df, "doc_id", "text", tau,
          maxDf)
      else NearDup.dedupByContainment(df, "doc_id", "text", tau, maxDf)
    out.select("doc_id").collect().map(_.getLong(0)).toSet
  }

  private def pairRows(df: DataFrame, tau: Double, maxDf: Int,
      viaJoin: Boolean): Set[(Long, Long, Long, Long, Long, Double, Double)] = {
    val out =
      if (viaJoin)
        NearDup.containmentPairsViaJoin(df, "doc_id", "text", tau, maxDf)
      else NearDup.containmentPairs(df, "doc_id", "text", tau, maxDf)
    out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toSet
  }

  private def assertEqual(docs: Seq[(Long, String)], tau: Double,
      maxDf: Int = NearDup.ContainmentMaxDfDefault): Unit = {
    val df = docs.toDF("doc_id", "text")
    val w = survivors(df, tau, maxDf, viaPairs = false)
    val p = survivors(df, tau, maxDf, viaPairs = true)
    assert(w == p, s"witness $w != pairs $p (tau=$tau, maxDf=$maxDf)")
    // and the PAIR surface: pruned candidate+verify emits the exact
    // frame the materialized join emits — ids, counts, both ratios
    val pp = pairRows(df, tau, maxDf, viaJoin = false)
    val pj = pairRows(df, tau, maxDf, viaJoin = true)
    assert(pp == pj,
      s"pruned pairs ${pp.size} != join pairs ${pj.size} " +
        s"(tau=$tau, maxDf=$maxDf): diff ${(pp diff pj) ++ (pj diff pp)}")
  }

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("excerpt chain C ⊂ B ⊂ A: keep-largest per pair, both paths") {
    val a = words("w", 40)
    val b = a.split(" ").take(25).mkString(" ")
    val c = a.split(" ").take(12).mkString(" ")
    assertEqual(Seq((1L, a), (2L, b), (3L, c), (4L, words("z", 30))),
      tau = 0.9)
  }

  test("clone families (one-token suffix variants): equal-size min-id " +
      "ties resolve identically") {
    val docs = (0 until 8).flatMap { f =>
      val base = words(s"f${f}w", 30)
      // original + 5 clones each appending a distinct token: clones
      // are pairwise cont n/(n+1), original is cont 1.0 in each clone
      (1 to 5).map(k => (f * 100L + k, s"$base rep$k")) :+
        (f * 100L, base)
    }
    assertEqual(docs, tau = 0.9)
  }

  test("hot-gram cap: boilerplate block capped out on both paths") {
    // 30 docs sharing a verbatim boilerplate sentence (df 30 > cap 8)
    // plus genuine excerpt relations in the distinctive remainder
    val boiler = words("common", 12)
    val docs = (0 until 30).map { i =>
      (i.toLong, s"$boiler ${words(s"d${i}u", 20)}")
    } ++ Seq((100L, words("d3u", 20)))  // excerpt of doc 3's unique part
    assertEqual(docs, tau = 0.9, maxDf = 8)
    assertEqual(docs, tau = 0.7, maxDf = 8)
  }

  test("uncapped-budget shortcut: docs whose uncapped grams cannot " +
      "reach tau are skipped, never mis-dropped") {
    val boiler = words("hot", 10)
    // doc 1 is ALL boilerplate (zero uncapped grams under the cap);
    // docs 2..9 carry the boilerplate too (df 9 > 4) plus unique text
    val docs = Seq((1L, boiler)) ++ (2L to 9L).map(i =>
      (i, s"$boiler ${words(s"u$i", 15)}"))
    assertEqual(docs, tau = 0.9, maxDf = 4)
  }

  test("tau sweep including 1.0 and a low tau on a seeded random soup") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 120).map(i => s"v$i")
    val base = (0 until 50).map { i =>
      (i.toLong,
        (0 until 20 + rnd.nextInt(30)).map(_ =>
          vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    // plant excerpts and verbatim duplicates
    val planted = base.take(12).zipWithIndex.map { case ((id, t), j) =>
      val toks = t.split(" ")
      if (j % 3 == 0) (1000L + id, toks.take(toks.length * 3 / 4).mkString(" "))
      else if (j % 3 == 1) (1000L + id, t) // verbatim twin
      else (1000L + id, (toks :+ "extra").mkString(" "))
    }
    for (tau <- Seq(0.5, 0.75, 0.9, 1.0))
      assertEqual(base ++ planted, tau)
  }

  test("zero-shingle docs (under 3 tokens) survive both paths") {
    assertEqual(Seq((1L, "a b"), (2L, "x"), (3L, words("w", 10)),
      (4L, words("w", 10) + " tail")), tau = 0.9)
  }
}
