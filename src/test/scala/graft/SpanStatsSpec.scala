package graft

import graft.functions.TextOps
import graft.operators.SpanStats
import org.apache.spark.sql.functions._

/** ngramsRaw construction + duplicated-span semantics. */
class SpanStatsSpec extends SparkSpec {

  test("ngramsRaw: positional spans, short docs empty, n=1 is tokens") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "x").toDF("text")
      .select(col("text"),
        TextOps.ngramsRaw(TextOps.tokens(col("text")), 3).as("g3"),
        TextOps.ngramsRaw(TextOps.tokens(col("text")), 1).as("g1"))
    val byText = df.collect()
      .map(r => r.getString(0) -> (r.getSeq[String](1).toList,
        r.getSeq[String](2).toList)).toMap
    assert(byText("a b c d")._1 == List("a b c", "b c d"))
    assert(byText("a b")._1 == Nil) // shorter than n
    assert(byText("x")._2 == List("x")) // n=1 == tokens
  }

  test("duplicatedNgramStats: cross-doc and self-repetition both count") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r s t"), // shares its only span with doc 2
      (2L, "p q r s t"),
      (3L, "a b c a b c a b"), // self-repeated "a b c a b" etc? no —
      // spans of 5: "a b c a b", "b c a b c", "c a b c a", "a b c a b"
      // -> first and last identical: self-repetition
      (4L, "u v w x y") // unique span
    ).toDF("doc_id", "text")
    val out = SpanStats.duplicatedNgramStats(docs, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((1L, 1L, 1.0)))
    assert(out(2L) == ((1L, 1L, 1.0)))
    // doc 3: 4 spans, the duplicated pair contributes 2
    assert(out(3L)._1 == 4L && out(3L)._2 == 2L)
    assert(out(4L) == ((1L, 0L, 0.0)))
  }

  test("contamination: benchmark overlap counted, clean and short docs 0.0") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // one span, fully in bench
      (2L, "p q r s t u"), // two spans, none in bench
      (3L, "x y"), // span-less
      (4L, "zzz alpha beta gamma delta epsilon zeta") // 3 spans, 2 hit
    ).toDF("doc_id", "text")
    val out = SpanStats.contamination(corpus, "doc_id", "text",
      bench, "text", 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((1L, 1L, 1.0)))
    assert(out(2L) == ((2L, 0L, 0.0)))
    assert(out(3L) == ((0L, 0L, 0.0))) // span-less: ratio 0, row kept
    assert(out(4L)._1 == 3L && out(4L)._2 == 2L)
  }

  test("contaminationBloomPruned: bit-identical to the unpruned operator") {
    import spark.implicits._
    // larger fixture so the Bloom filter prunes a real fraction and
    // false positives are plausible (tiny filter, fpp 0.2)
    val bench = (0L until 20L).map(i =>
      (i, s"b$i c$i d$i e$i f$i g$i")).toDF("doc_id", "text")
    val corpus = (100L until 200L).map { i =>
      val t = if (i % 4 == 0) s"b${i % 20} c${i % 20} d${i % 20} e${i % 20} f${i % 20} tail$i"
        else s"u$i v$i w$i x$i y$i z$i"
      (i, t)
    }.toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val exact = canon(SpanStats.contamination(
      corpus, "doc_id", "text", bench, "text", 5))
    val pruned = canon(SpanStats.contaminationBloomPruned(
      corpus, "doc_id", "text", bench, "text", 5,
      expectedGrams = 50L, fpp = 0.2))
    assert(pruned === exact)
    assert(exact.exists(_._3 > 0L), "fixture never contaminates")
  }

  test("cleanText: urls stripped, emails masked, whitespace collapsed") {
    import spark.implicits._
    import graft.functions.TextOps
    val rows = Seq(
      "go to https://a.b/c?d=1 then  mail bob.smith+x@mail.co today",
      "  spaced   out  ",
      "no dirt here").toDF("t")
      .select(TextOps.cleanText(col("t")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(rows(0) == "go to then mail <email> today")
    assert(rows(1) == "spaced out")
    assert(rows(2) == "no dirt here")
  }

  test("scrubPii: emails, phones, IPv4s masked; clean text untouched") {
    import spark.implicits._
    import graft.functions.TextOps
    val rows = Seq(
      "reach me at +55-123-555-0199 or a.b@mail.co from 10.2.0.41 ok",
      "short digits 123-45 stay, year 2026 stays, 1.2.3.4 goes",
      "call 415-555-2671 on 2026-08-13 or range 1999-2026",
      "plain sentence with no identifiers at all").toDF("t")
      .select(TextOps.scrubPii(col("t")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(rows(0) == "reach me at <phone> or <email> from <ip> ok")
    assert(rows(1) == "short digits 123-45 stay, year 2026 stays, <ip> goes")
    // NANP masked; ISO dates and numeric ranges SURVIVE — the false
    // positive the narrow phone shapes exist to avoid
    assert(rows(2) == "call <phone> on 2026-08-13 or range 1999-2026")
    assert(rows(3) == "plain sentence with no identifiers at all")
  }

  test("removeDuplicatedSpans: shared spans cut, self-repetition kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z w v a b c d e"), // shares "x y z w v" with doc 2
      (2L, "q r x y z w v s t"),
      (3L, "unique words only here now"),
      (4L, "p p p p p p p p p p")) // self-repeated, single doc
      .toDF("doc_id", "text")
    val out = SpanStats.removeDuplicatedSpans(docs, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out(1L) == (("a b c d e", 5L)))
    assert(out(2L) == (("q r s t", 5L)))
    assert(out(3L) == (("unique words only here now", 0L)))
    // distinct-doc counting: within-doc repetition is NOT boilerplate
    assert(out(4L) == (("p p p p p p p p p p", 0L)))
  }

  test("removeDuplicatedSpans: identical docs empty out; minDocs guards") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "g h i j k l"))
      .toDF("doc_id", "text")
    val out = SpanStats.removeDuplicatedSpans(docs, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out(1L) == (("", 6L)) && out(2L) == (("", 6L)))
    assert(out(3L)._2 == 0L)
    // raising minDocs above the duplication degree keeps everything
    val strict = SpanStats
      .removeDuplicatedSpans(docs, "doc_id", "text", 5, minDocs = 3)
      .collect().map(r => r.getLong(2)).sum
    assert(strict == 0L)
  }

  test("duplicatedNgramStats: docs shorter than n produce no row") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b c d e f")).toDF("doc_id", "text")
    val out = SpanStats.duplicatedNgramStats(docs, "doc_id", "text", 5)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
