package graft

import graft.operators.Pack
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pack.packByBudget: two-level prefix sum == single-window reference
  * at any bucket count and partitioning. */
class PackSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    // sparse, unevenly spaced ids exercise range bucketing
    (0L until 300L).map(i => (i * i * 7 % 9973, 10L + i % 90))
      .groupBy(_._1).map(_._2.head).toSeq // unique ids
      .toDF("id", "cnt")
  }

  private def reference(budget: Long) =
    corpus.withColumn("shard",
      expr(s"CAST(coalesce(sum(cnt) OVER (ORDER BY id ROWS BETWEEN " +
        s"UNBOUNDED PRECEDING AND 1 PRECEDING), 0) DIV $budget AS BIGINT)"))
      .select("id", "shard")

  test("packByBudget matches the single-window reference for any nBuckets") {
    val ref = reference(500L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    for (nb <- Seq(1, 3, 17, 1024)) {
      val got = Pack.packByBudget(corpus, "id", "cnt", 500L, nb)
        .select("id", "shard").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == ref, s"nBuckets=$nb diverged")
    }
  }

  test("packByBudget is partitioning-independent and preserves rows") {
    val a = Pack.packByBudget(corpus, "id", "cnt", 750L, 13)
      .select("id", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Pack.packByBudget(corpus.repartition(19), "id", "cnt", 750L, 13)
      .select("id", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
    assert(a.size == corpus.count())
    // shards are contiguous from 0 and token-bounded by budget + max doc
    val withCnt = Pack.packByBudget(corpus, "id", "cnt", 750L, 13)
    val shardTotals = withCnt.groupBy("shard").agg(sum("cnt").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxShard = shardTotals.keys.max
    assert(shardTotals.keySet == (0L to maxShard).toSet)
    val maxCnt = 99L
    assert(shardTotals.filter(_._1 < maxShard)
      .values.forall(_ <= 750L + maxCnt))
  }

  test("packByBudget: empty input returns empty with shard column") {
    val empty = Pack.packByBudget(corpus.filter(col("id") < 0),
      "id", "cnt", 100L)
    assert(empty.columns.contains("shard"))
    assert(empty.count() == 0)
  }

  test("packSequences: fixed lengths, exact stream reassembly, stable") {
    import spark.implicits._
    // uneven docs incl. one longer than seqLen and one empty
    val docs = (0L until 40L).map { i =>
      (i * 13 % 997, (0 until (if (i == 7) 60 else (i % 9).toInt))
        .map(j => (i * 100 + j).toInt).toSeq)
    }.groupBy(_._1).map(_._2.head).toSeq.toDF("id", "ids")
    val seqs = graft.operators.Pack.packSequences(docs, "id", "ids",
      seqLen = 16, nBuckets = 5)
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSeq
    // every sequence is FULL except the last; ids are 0..n-1 dense
    assert(seqs.map(_._1) == seqs.indices.map(_.toLong))
    seqs.init.foreach { case (sid, n, ids) =>
      assert(n == 16 && ids.size == 16, s"seq $sid not full")
    }
    // concatenating sequences reproduces the doc streams in id order
    val stream = seqs.flatMap(_._3)
    val expected = docs.collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
      .sortBy(_._1).flatMap(_._2).toSeq
    assert(stream == expected)
    // decomposition-independent: other bucket counts and partitionings
    for (nb <- Seq(1, 3, 17)) {
      val again = graft.operators.Pack.packSequences(
        docs.repartition(7), "id", "ids", 16, nb)
        .orderBy("seq_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSeq
      assert(again == seqs, s"nBuckets=$nb diverged")
    }
  }

  test("packSequencesWithSpans: spans tile each sequence and reassemble the docs") {
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      (i * 13 % 997, (0 until (if (i == 7) 60 else (i % 9).toInt))
        .map(j => (i * 100 + j).toInt).toSeq)
    }.groupBy(_._1).map(_._2.head).toSeq.toDF("id", "ids")
    val seqs = graft.operators.Pack.packSequencesWithSpans(
      docs, "id", "ids", seqLen = 16, nBuckets = 5)
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2),
        r.getSeq[org.apache.spark.sql.Row](3)
          .map(p => (p.getLong(0), p.getInt(1), p.getInt(2)))))
      .toSeq
    // token_ids identical to the span-less packer
    val plain = graft.operators.Pack.packSequences(docs, "id", "ids",
      16, 5).orderBy("seq_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSeq
    assert(seqs.map(t => (t._1, t._2, t._3)) == plain)
    // spans tile [0, n_tokens) in order: sorted by pos, no gaps, no
    // overlap, and each span's slice is a contiguous run of its doc
    val byDoc = docs.collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    seqs.foreach { case (sid, n, ids, spans) =>
      assert(spans.map(_._2) == spans.map(_._2).sorted, s"seq $sid order")
      assert(spans.scanLeft(0) { case (acc, (_, pos, len)) =>
        assert(pos == acc, s"seq $sid gap/overlap at $pos, want $acc")
        acc + len
      }.last == n, s"seq $sid spans don't cover n_tokens")
      spans.foreach { case (doc, pos, len) =>
        val slice = ids.slice(pos, pos + len)
        assert(byDoc(doc).containsSlice(slice),
          s"seq $sid span of doc $doc is not a run of that doc")
      }
    }
    // every doc's spans, concatenated across sequences in seq order,
    // rebuild the doc exactly
    val rebuilt = seqs.flatMap { case (sid, _, ids, spans) =>
      spans.map { case (doc, pos, len) =>
        (doc, sid, ids.slice(pos, pos + len))
      }
    }.groupBy(_._1).map { case (doc, g) =>
      doc -> g.sortBy(_._2).flatMap(_._3).toSeq
    }
    byDoc.filter(_._2.nonEmpty).foreach { case (doc, ids) =>
      assert(rebuilt(doc) == ids, s"doc $doc not rebuilt from spans")
    }
  }

  test("packSequences: a NULL token array is an empty doc, not -1 tokens") {
    import spark.implicits._
    // legacy sizeOfNull makes bare size(null) = -1, which would shift
    // every later document's offset left by one — doc 3's tokens must
    // still start exactly where doc 1's ended
    val docs = Seq(
      (1L, Seq(10, 11, 12)),
      (2L, null.asInstanceOf[Seq[Int]]),
      (3L, Seq(30, 31))).toDF("id", "ids")
    val seqs = graft.operators.Pack.packSequences(docs, "id", "ids",
      seqLen = 4, nBuckets = 3)
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](2))).toSeq
    assert(seqs == Seq((0L, Seq(10, 11, 12, 30)), (1L, Seq(31))))
  }

  test("packByBudget: mixed null ids fail the contract, not an NPE") {
    import spark.implicits._
    val mixed = Seq((java.lang.Long.valueOf(1L), 10L),
      (null.asInstanceOf[java.lang.Long], 10L),
      (java.lang.Long.valueOf(3L), 10L)).toDF("id", "cnt")
    val e = intercept[IllegalArgumentException] {
      Pack.packByBudget(mixed, "id", "cnt", 100L).collect()
    }
    assert(e.getMessage.contains("null"))
  }

  test("packByBudget: all-null counts contribute 0, no NPE") {
    import spark.implicits._
    // ids force >1 bucket with nBuckets=2; the high bucket's counts are
    // all null => its total must coalesce to 0, not NPE on getLong
    val df = Seq((0L, java.lang.Long.valueOf(40L)),
      (1L, java.lang.Long.valueOf(80L)),
      (1000L, null.asInstanceOf[java.lang.Long]),
      (1001L, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "cnt")
    val out = Pack.packByBudget(df, "id", "cnt", 50L, nBuckets = 2)
      .select("id", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // prefix sums: id0 -> 0, id1 -> 40, id1000 -> 120, id1001 -> 120
    assert(out == Map(0L -> 0L, 1L -> 0L, 1000L -> 2L, 1001L -> 2L))
  }
}
