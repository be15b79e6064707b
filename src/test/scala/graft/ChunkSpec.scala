package graft

import graft.operators.Chunk
import org.apache.spark.sql.functions._

/** Content-defined chunking: lossless reassembly, edit locality (the
  * property fixed-size blocking lacks), determinism, dup stats. */
class ChunkSpec extends SparkSpec {

  private def doc(id: Long, text: String) = {
    import spark.implicits._
    Seq((id, text)).toDF("doc_id", "text")
  }

  private def chunksOf(text: String): Seq[String] =
    Chunk.contentDefinedChunks(doc(1L, text), "doc_id", "text",
      window = 8, modulus = 16)
      .orderBy("chunk_idx").collect().map(_.getString(2)).toSeq

  test("chunks reassemble to the exact text; short/empty edge cases") {
    val t = "the quick brown fox jumps over the lazy dog " * 5
    val cs = chunksOf(t)
    assert(cs.size > 1, "modulus 16 on a 220-char text must split")
    assert(cs.mkString == t)
    assert(cs.forall(_.nonEmpty))
    assert(chunksOf("short") == Seq("short")) // below window: one chunk
    assert(Chunk.contentDefinedChunks(doc(1L, ""), "doc_id", "text")
      .count() == 0)
  }

  test("edit locality: a prefix edit re-syncs at the next boundary") {
    val base = "the quick brown fox jumps over the lazy dog " * 5
    val edited = "X" + base
    val a = chunksOf(base)
    val b = chunksOf(edited)
    // fixed-size blocking would shift EVERY block; content-defined
    // boundaries depend only on the trailing window, so the chunk sets
    // re-align after the edited region — the tail chunks are identical
    val common = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }
    assert(common.size >= a.size - 2,
      s"tail failed to re-sync: ${a.size} vs shared ${common.size}")
    assert(b.mkString == edited)
  }

  test("chunking is deterministic and partitioning-independent") {
    import spark.implicits._
    val docs = (0L until 50L)
      .map(i => (i, s"document number $i " + ("content " * (i % 7 + 1).toInt)))
      .toDF("doc_id", "text")
    val a = Chunk.contentDefinedChunks(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val b = Chunk.contentDefinedChunks(docs.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(a == b)
  }

  test("rolling-fingerprint variant: same contract, codegen'd predicate") {
    import spark.implicits._
    val t = "the quick brown fox jumps over the lazy dog " * 5
    val df = Chunk.contentDefinedChunksRolling(doc(1L, t), "doc_id",
      "text", window = 8, modulus = 16)
    val cs = df.orderBy("chunk_idx").collect().map(_.getString(2)).toSeq
    assert(cs.size > 1 && cs.mkString == t && cs.forall(_.nonEmpty))
    // short/empty contracts match the md5 variant
    assert(Chunk.contentDefinedChunksRolling(doc(1L, "short"), "doc_id",
      "text").collect().map(_.getString(2)).toSeq == Seq("short"))
    assert(Chunk.contentDefinedChunksRolling(doc(1L, ""), "doc_id",
      "text").count() == 0)
    // the predicate is a codegen'd native expression, not a UDF — a
    // Range source keeps the expression in the plan (over a
    // LocalRelation, Catalyst folds it into the LocalTableScan before
    // the assert can see it)
    val ranged = Chunk.contentDefinedChunksRolling(
      spark.range(10).select(col("id").as("doc_id"),
        concat(lit("some text payload repeated here "), col("id"))
          .as("text")),
      "doc_id", "text", 8, 16)
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("rolling_bounds"), plan.take(300))
    assert(!plan.contains("UDF"))
    // expected chunk length tracks the modulus
    val big = (0 until 200).map(i => s"w$i t$i c$i").mkString(" ")
    val n16 = Chunk.contentDefinedChunksRolling(doc(1L, big), "doc_id",
      "text", 8, 16).count()
    val n64 = Chunk.contentDefinedChunksRolling(doc(1L, big), "doc_id",
      "text", 8, 64).count()
    assert(n16 > n64, s"modulus 16 gave $n16 chunks vs 64 -> $n64")
  }

  test("md5_bounds native kernel equals the HOF reference, position for position") {
    import spark.implicits._
    // the r12 optimization replaced the interpreted filter/md5/conv
    // pipeline with expressions.Md5Bounds — boundary POSITIONS must be
    // bit-identical (t45's oracle replays them literally). Cover:
    // ASCII, multi-byte UTF-8 (code-point counting), len == window,
    // len == window+1, empty, and several moduli.
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog " * 5,
      "exactly8!", // len = 9 -> single candidate position 8
      "12345678",  // len = window -> no boundaries
      "",          // empty -> no boundaries
      "héllo wörld ünïcode çhàrs repeated häre " * 6, // 2-byte chars
      "日本語のテキストが続く何度も何度も繰り返される " * 8, // 3-byte chars
      (0 until 300).map(i => s"t$i").mkString(" "))
    for (m <- Seq(4, 16, 64)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val native = df.select(col("doc_id"),
        org.apache.spark.sql.GraftColumnBridge.column(
          graft.expressions.Md5Bounds(
            org.apache.spark.sql.GraftColumnBridge.expression(col("text")),
            8, m)).as("b"))
      val hof = df.select(col("doc_id"),
        Chunk.md5BoundsHof("text", 8, m).as("b"))
      val n = native.collect().map(r =>
        r.getLong(0) -> r.getSeq[Int](1)).toMap
      val h = hof.collect().map(r =>
        r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(n == h, s"modulus $m: native $n vs hof $h")
      // non-degenerate: at least one text must actually split at m=4
      if (m == 4) assert(n.values.exists(_.nonEmpty))
    }
    // the kernel is in the executed plan (codegen'd, not a UDF)
    val ranged = Chunk.contentDefinedChunks(
      spark.range(10).select(col("id").as("doc_id"),
        concat(lit("some text payload repeated here "), col("id"))
          .as("text")),
      "doc_id", "text", 8, 16)
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("md5_bounds"), plan.take(300))
  }

  test("chunkDupStats: shared boilerplate fragment is flagged") {
    import spark.implicits._
    val boiler = "subscribe to our newsletter for updates " * 3
    val docs = Seq(
      (1L, "unique article one body text here today " * 3 + boiler),
      (2L, "completely different second story lines " * 3 + boiler),
      // non-repeating: self-repetition legitimately counts as
      // duplication (chunks recur corpus-wide), so doc 3 must not
      // repeat itself either
      (3L, (0 until 20).map(i => s"unique$i word$i").mkString(" ")))
      .toDF("doc_id", "text")
    val stats = Chunk.chunkDupStats(docs, "doc_id", "text",
      window = 8, modulus = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // the boilerplate tail chunks are byte-identical across docs 1+2
    assert(stats(1L)._2 > 0, s"doc1 ${stats(1L)} saw no dup chunks")
    assert(stats(2L)._2 > 0)
    assert(stats(3L)._2 == 0, s"doc3 ${stats(3L)} false positive")
  }

  test("tokenWindows: overlap, short tail kept, null/empty emit nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6"), // 7 tokens
      (2L, "a b"),                  // shorter than one window
      (3L, null),
      (4L, "")).toDF("doc_id", "text") // split("") = [""] — must NOT
                                       // emit a phantom empty chunk
    val got = Chunk.tokenWindows(docs, "doc_id", "text",
        size = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      (1L, 0L, "t0 t1 t2 t3", 4L),
      (1L, 1L, "t3 t4 t5 t6", 4L), // overlap of size - stride = 1
      (1L, 2L, "t6", 1L),          // short tail kept, not padded
      (2L, 0L, "a b", 2L)))
    // chunks cover every token: reassembling stride-slices restores text
    val nonOverlap = Chunk.tokenWindows(docs.filter($"doc_id" === 1),
        "doc_id", "text", size = 3, stride = 3)
      .orderBy("chunk_id").collect().map(_.getString(2)).mkString(" ")
    assert(nonOverlap === "t0 t1 t2 t3 t4 t5 t6")
  }
}
