package graft

import graft.operators.NearDup
import org.apache.spark.sql.functions._

/** Composed near-dup operators: incremental-against-corpus semantics
  * and the algebraic properties every dedup must satisfy
  * (survivors ⊆ input, idempotence, existing-wins).
  */
class NearDupSpec extends SparkSpec {
  import spark.implicits._

  private val textA = "alpha beta gamma delta epsilon zeta eta theta"
  private val textC = "one two three four five six seven eight nine"
  private val textE = "totally different words nothing shared here at all"

  test("dedupByMinhashIncremental: existing wins, incoming self-dedups") {
    val existing = Seq((1L, textA), (2L, textE)).toDF("doc_id", "text")
    val existingBands = NearDup.minhashBands(existing, "doc_id", "text",
      12, 4)
    // incoming: 10 = dup of existing 1; 11 = new; 12 = dup of 11
    val incoming = Seq((10L, textA), (11L, textC), (12L, textC))
      .toDF("doc_id", "text")
    val survivors = NearDup.dedupByMinhashIncremental(incoming, "doc_id",
      "text", existingBands, existing, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(survivors.toSeq == Seq(11L))
  }

  test("dedupByMinhashIncremental: empty existing == plain dedup") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val emptyBands = NearDup.minhashBands(empty, "doc_id", "text", 12, 4)
    val incoming = Seq((10L, textA), (11L, textA), (12L, textC))
      .toDF("doc_id", "text")
    val inc = NearDup.dedupByMinhashIncremental(incoming, "doc_id",
      "text", emptyBands, empty, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val plain = NearDup.dedupByMinhash(incoming, "doc_id", "text", 0.8)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(inc == plain && inc == Seq(10L, 12L))
  }

  test("dedupByEmbeddingIncremental: existing wins, incoming self-dedups") {
    val vA = Array.tabulate(8)(i => 1.0 + i) // existing direction
    val vB = Array.tabulate(8)(i => if (i % 2 == 0) 5.0 else -3.0)
    val existing = Seq((1L, vA.toSeq)).toDF("vec_id", "v")
    val exBands = NearDup.embeddingBands(existing, "vec_id", "v", 8, 4, 4)
    // 10 = same direction as existing 1 (scaled); 11 = new direction;
    // 12 = same direction as 11
    val incoming = Seq(
      (10L, vA.map(_ * 2.0).toSeq),
      (11L, vB.toSeq),
      (12L, vB.map(_ * 3.0).toSeq)).toDF("vec_id", "v")
    val survivors = NearDup.dedupByEmbeddingIncremental(incoming,
      "vec_id", "v", exBands, existing, threshold = 0.99, dims = 8)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(survivors.toSeq == Seq(11L))
  }

  test("dedup family: survivors ⊆ input and idempotent") {
    val docs = Seq((1L, textA), (2L, textA), (3L, textC), (4L, textE))
      .toDF("doc_id", "text")
    for (dedup <- Seq(
      (d: org.apache.spark.sql.DataFrame) =>
        NearDup.dedupByMinhash(d, "doc_id", "text", 0.8),
      (d: org.apache.spark.sql.DataFrame) =>
        NearDup.dedupBySimhash(d, "doc_id", "text", maxHamming = 1))) {
      val once = dedup(docs)
      val ids = once.select("doc_id").collect().map(_.getLong(0)).toSet
      val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids.subsetOf(all))
      assert(ids.contains(1L) && !ids.contains(2L)) // min id survives
      val twice = dedup(once).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(twice == ids) // idempotent: dedup(dedup(x)) == dedup(x)
    }
  }
}
