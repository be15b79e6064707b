package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._

/** charLmScore semantics: reference-like text outranks gibberish,
  * unseen material degrades gracefully, counts are exact. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val refText = "the quick brown fox jumps over the lazy dog " +
    "and the dog sleeps under the brown tree near the quick river"

  test("reference-like text scores above gibberish and unseen charsets") {
    val ref = Seq(Tuple1(refText)).toDF("text")
    val docs = Seq(
      (1L, "the quick dog jumps over the lazy fox"), // reference-like
      (2L, "zxqv kjwq pzxk vvqj zzxq wqkj"), // gibberish, seen charset
      (3L, "ΩΩΩ ΔΔΔ ΨΨΨ ΦΦΦ")) // entirely unseen chars
      .toDF("doc_id", "text")
    val scores = Quality.charLmScore(docs, "doc_id", "text", ref, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // the discriminative property: reference-like text well above BOTH
    // gibberish forms. (No ordering is asserted between the two
    // gibberish docs: under add-one smoothing a seen prefix with an
    // unseen continuation scores 1/(c2+V) — legitimately below a fully
    // novel context's 1/V.)
    assert(scores(1L) > scores(2L) + 0.5,
      s"reference-like ${scores(1L)} not above gibberish ${scores(2L)}")
    assert(scores(1L) > scores(3L) + 0.5,
      s"reference-like ${scores(1L)} not above unseen ${scores(3L)}")
    // smoothing keeps every score finite
    assert(scores.values.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("dsirWeights: target-like docs weigh positive, raw-like negative") {
    // raw model = same charset, different trigram distribution (each
    // word char-reversed) — matched charsets keep the add-one-smoothed
    // unseen-trigram probability 1/(c2+V) comparable across models, so
    // the ratio is driven by what was SEEN, not by vocabulary size
    def rev(s: String) = s.split(" ").map(_.reverse).mkString(" ")
    val target = Seq(Tuple1(refText)).toDF("text")
    val raw = Seq(Tuple1(rev(refText))).toDF("text")
    val docs = Seq(
      (1L, "the quick dog jumps over the lazy fox"), // target-like
      (2L, rev("the quick dog jumps over the lazy fox"))) // raw-like
      .toDF("doc_id", "text")
    val out = Quality.dsirWeights(docs, "doc_id", "text",
      target, "text", raw, "text")
    val m = out.collect().map(r => r.getLong(0) ->
      (r.getDouble(4), r.getBoolean(5))).toMap
    assert(m(1L)._1 > 0 && m(1L)._2, s"target-like weight ${m(1L)}")
    assert(m(2L)._1 < 0 && !m(2L)._2, s"raw-like weight ${m(2L)}")
    // the fused pass publishes exactly the two charLmScore scores
    val lpT = Quality.charLmScore(docs, "doc_id", "text", target, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val lpR = Quality.charLmScore(docs, "doc_id", "text", raw, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val pub = out.collect().map(r => r.getLong(0) ->
      (r.getDouble(2), r.getDouble(3))).toMap
    assert(pub(1L) == ((lpT(1L), lpR(1L))) && pub(2L) == ((lpT(2L), lpR(2L))))
  }

  test("trigram counts are exact; short docs have no row") {
    val ref = Seq(Tuple1(refText)).toDF("text")
    val docs = Seq((1L, "abcde"), (2L, "ab")).toDF("doc_id", "text")
    val rows = Quality.charLmScore(docs, "doc_id", "text", ref, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 3L)) // "abc","bcd","cde"; "ab" has none
  }

  test("lexicalDiversity: hand-computed counts/ratios/entropy; empty " +
    "and degenerate docs report zeros; plan stays exchange-free") {
    val docs = Seq(
      (1L, Some("a b a b c")), // counts: a2 b2 c1 → N5 types3 hapax1
      (2L, Some("x x x x")),   // single type, no hapax, entropy 0
      (3L, Some("")),          // no tokens at all
      (4L, Some("one  two")),  // double space: empty token filtered
      (5L, Option.empty[String]) // NULL text behaves like empty
    ).toDF("doc_id", "text")
    val got = Quality.lexicalDiversity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // entropy replays the operator's fixed-point contract:
    // Σ floor(−p·ln p · 1e12) / 1e12, rounded to 6
    def fp(t: Double) = math.floor(t * 1e12).toLong
    val ent1 = r6((2 * fp(-(0.4 * math.log(0.4))) +
      fp(-(0.2 * math.log(0.2)))) / 1e12)
    assert(got(1L) == ((5L, 3L, 1L, 0.6, r6(1.0 / 3), ent1)))
    assert(got(2L) == ((4L, 1L, 0L, 0.25, 0.0, 0.0)))
    assert(got(3L) == ((0L, 0L, 0L, 0.0, 0.0, 0.0)))
    assert(got(4L) == ((2L, 2L, 2L, 1.0, 1.0,
      r6(2 * fp(-(0.5 * math.log(0.5))) / 1e12))))
    assert(got(5L) == ((0L, 0L, 0L, 0.0, 0.0, 0.0)),
      "NULL text must report zeros, not NULLs (oracle COALESCE parity)")
    // zero-shuffle contract: a pure map stage, like repetitionSignals
    val plan = Quality.lexicalDiversity(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no exchange:\n$plan")
  }

  test("scoring is partitioning-independent") {
    val ref = Seq(Tuple1(refText)).toDF("text")
    val docs = (0L until 50L)
      .map(i => (i, s"doc number $i with the quick brown words"))
      .toDF("doc_id", "text")
    val a = Quality.charLmScore(docs, "doc_id", "text", ref, "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sorted.toSeq
    val b = Quality.charLmScore(docs.repartition(7), "doc_id", "text",
      ref, "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sorted.toSeq
    assert(a == b)
  }
}
