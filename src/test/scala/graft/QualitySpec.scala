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

  test("trigram counts are exact; short docs have no row") {
    val ref = Seq(Tuple1(refText)).toDF("text")
    val docs = Seq((1L, "abcde"), (2L, "ab")).toDF("doc_id", "text")
    val rows = Quality.charLmScore(docs, "doc_id", "text", ref, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 3L)) // "abc","bcd","cde"; "ab" has none
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
