package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

/** BPE: hand-computed training + apply pins, determinism, codegen. */
class BpeSpec extends SparkSpec {

  test("trainLocal: classic dictionary learns the expected merges") {
    // Sennrich's toy dictionary. Round-1 pair counts: (e,s) = 6+3+3 =
    // 12 ties (s,t) = 12 and wins lexicographically; then (es,t) = 12;
    // then (l,o) = 10 ties (o,w) and wins; then (lo,w) = 10.
    val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("lowest", 3L))
    val merges = Bpe.trainLocal(dict, 4)
    assert(merges ==
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("apply: pinned string -> token pins under GateMerges") {
    import spark.implicits._
    val df = Seq(
      ("customer", 1L), // trained whole-word merge chain
      ("batches", 3L), // batch + e + s
      ("zzz qq", 5L), // no merges apply: 3 + 2 chars
      ("join order value", 3L), // three whole-word fusions
      ("", 0L), // empty text: zero tokens
      ("  spaced   out  ", 9L)) // empty words skipped; no merges hit:
      // spaced = s+p+a+c+e+d (6), out = o+u+t (3)
      .toDF("text", "expected")
    val got = df.select(col("text"), col("expected"),
      Bpe.tokenCount(col("text"), Bpe.GateMerges).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (t, want, n) =>
      assert(n == want, s"'$t' expected $want tokens, got $n")
    }
    // token array agrees with count and concatenates back to the text
    val toks = spark.sql("SELECT 1").select(
      Bpe.tokens(lit("join order value"), Bpe.GateMerges).as("t"))
      .collect()(0).getSeq[String](0)
    assert(toks == Seq("join", "order", "value"))
  }

  test("tokenIds: vocab space is total, deterministic, round-trippable") {
    import spark.implicits._
    val v = Bpe.vocab(Bpe.GateMerges)
    assert(v.take(2) == Seq("<pad>", "<unk>"))
    assert(v(2) == " " && v.contains("customer"))
    val ids = Seq(("customer x Ω", 0)).toDF("text", "d")
      .select(Bpe.tokenIds(col("text"), Bpe.GateMerges).as("i"))
      .collect()(0).getSeq[Int](0)
    // customer -> its merge-product id; x -> ASCII atom id; Ω -> unk
    assert(ids.size == 3)
    assert(v(ids(0)) == "customer")
    assert(v(ids(1)) == "x")
    assert(ids(2) == 1, s"non-ASCII atom must map to <unk>, got ${ids(2)}")
  }

  test("decode: inverts tokenIds up to the word pre-split; <unk> is explicit") {
    import spark.implicits._
    val out = Seq(("the customer paid", 0), ("x Ω y", 1))
      .toDF("text", "d")
      .select(col("d"), Bpe.decode(
        Bpe.tokenIds(col("text"), Bpe.GateMerges),
        Bpe.GateMerges).as("decoded"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    // ASCII: word concatenation (the delimiter is consumed by the
    // pre-split, a documented apply-side property)
    assert(out(0) == "thecustomerpaid")
    // non-ASCII atom surfaces as the literal <unk> token
    assert(out(1) == "x<unk>y")
  }

  test("decode: out-of-vocab ids surface as a visible sentinel, " +
    "never silently dropped (r7 advice)") {
    import spark.implicits._
    val vocabSize = Bpe.vocab(Bpe.GateMerges).size
    val good = Seq("the").toDF("text")
      .select(Bpe.tokenIds(col("text"), Bpe.GateMerges).as("ids"))
      .select(col("ids").getItem(0).as("id")).head().getInt(0)
    val out = Seq(
      (0, Seq(good)),                    // in-vocab control
      (1, Seq(good, vocabSize + 7)),     // beyond vocab
      (2, Seq(-1, good))                 // negative id
    ).toDF("d", "ids")
      .select(col("d"),
        Bpe.decode(col("ids"), Bpe.GateMerges).as("s"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(!out(0).contains("�"))
    assert(out(1) == out(0) + "�",
      s"OOV id must decode to the sentinel, got '${out(1)}'")
    assert(out(2) == "�" + out(0),
      s"negative id must decode to the sentinel, got '${out(2)}'")
  }

  test("apply: lowest-rank-first leftmost semantics, not left-to-right") {
    import spark.implicits._
    // merges: rank0 (b,c), rank1 (a,b). "abc": left-to-right greedy
    // would fuse (a,b) first -> [ab, c]; canonical BPE fuses the
    // LOWEST-RANK pair (b,c) first -> [a, bc], and (a,bc) has no rank.
    val m = Seq(("b", "c"), ("a", "b"))
    val toks = Seq("abc").toDF("text")
      .select(Bpe.tokens(col("text"), m).as("t"))
      .collect()(0).getSeq[String](0)
    assert(toks == Seq("a", "bc"))
  }

  test("tokenCount stays in whole-stage codegen (no UDF)") {
    val df = spark.range(100)
      .select(concat(lit("customer value "), col("id")).as("text"))
      .select(Bpe.tokenCount(col("text"), Bpe.GateMerges).as("n"))
    // '*(n)' is the whole-stage-codegen stage marker in the compact
    // plan string — the Project carrying bpe_token_count must be
    // inside one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(400))
    assert(!plan.contains("UDF"))
    assert(df.agg(sum("n")).collect()(0).getLong(0) > 0)
  }

  test("train: distributed dictionary training is deterministic") {
    import spark.implicits._
    val corpus = Seq.fill(20)("low lower newest widest lowest")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    // every word has count 20 here (unlike the weighted toy dict), so
    // round 1 ties (e,s),(l,o),(o,w),(s,t),(w,e) at 60 and (e,s) wins
    // lexicographically, then (es,t), then (l,o), then (lo,w)
    val a = Bpe.train(corpus, "text", 4)
    val b = Bpe.train(corpus.repartition(7), "text", 4)
    assert(a == b)
    assert(a == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }
}
