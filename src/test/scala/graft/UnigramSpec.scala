package graft

import graft.expressions.UnigramKernel
import graft.functions.Unigram
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer: hand-computed Viterbi pins, tie-break order,
  * train determinism, round trip, codegen apply. */
class UnigramSpec extends SparkSpec {

  // a tiny hand-auditable table: cheap multis, uniform singles
  private val hand: Seq[(String, Double)] = Seq(
    ("a", 3.0), ("b", 3.0), ("c", 3.0), ("d", 3.0),
    ("ab", 2.0), ("bc", 2.0), ("abc", 4.5))

  test("Viterbi: min cost wins; cost ties break on token count, " +
    "then on the '|'-joined path") {
    val k = UnigramKernel.forPieces(hand)
    // 'abc': a|bc = 5.0, ab|c = 5.0, abc = 4.5, a|b|c = 9.0 → abc
    assert(k.applyWord("abc").toSeq == Seq("abc"))
    // 'abcd': abc|d = 7.5, ab|c|d = 8.0, a|bc|d = 8.0 → abc|d
    assert(k.applyWord("abcd").toSeq == Seq("abc", "d"))
    // 'abbc': ab|bc = 4.0 uniquely beats ab|b|c = a|b|bc = 8.0
    assert(k.applyWord("abbc").toSeq == Seq("ab", "bc"))
    // COST TIE, equal ntok → '|'-joined path lex: drop the 'abc'
    // piece so 'abc' splits as ab|c = 5.0 vs a|bc = 5.0 (2 tokens
    // each); "ab|c" < "a|bc" because 'b' (0x62) < '|' (0x7c)
    val k3 = UnigramKernel.forPieces(hand.filterNot(_._1 == "abc"))
    assert(k3.applyWord("abc").toSeq == Seq("ab", "c"))
    // cost tie, DIFFERENT ntok prefers fewer tokens
    val t2 = Seq(("x", 1.0), ("y", 1.0), ("xy", 2.0))
    val k2 = UnigramKernel.forPieces(t2)
    // xy: 'xy' = 2.0 (1 token) vs x|y = 2.0 (2 tokens) → xy
    assert(k2.applyWord("xy").toSeq == Seq("xy"))
  }

  test("Viterbi: uncovered characters fall through to per-char unk " +
    "steps and never displace a real piece") {
    val k = UnigramKernel.forPieces(hand)
    // 'q' is not in the table: one unk step, token = the raw char
    assert(k.applyWord("qab").toSeq == Seq("q", "ab"))
    // ids: unk → 1, real pieces → 2 + table index
    import spark.implicits._
    val ids = Seq("qab").toDF("text")
      .select(Unigram.tokenIds(col("text"), hand).as("ids"))
      .collect()(0).getSeq[Int](0)
    assert(ids == Seq(1, 2 + hand.indexWhere(_._1 == "ab")))
  }

  test("trainLocal: deterministic, total coverage, vocab budget holds") {
    val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("lowest", 3L))
    val t1 = Unigram.trainLocal(dict, vocabSize = 100)
    val t2 = Unigram.trainLocal(dict, vocabSize = 100)
    assert(t1 == t2, "same dictionary must yield the identical table")
    // every printable-ASCII single survives (coverage contract) —
    // except ' ' (space-split words) and the reserved '|' separator
    val pieces = t1.map(_._1).toSet
    assert((32 to 126).filterNot(c => c == ' ' || c == '|')
      .forall(c => pieces.contains(c.toChar.toString)))
    assert(!pieces.contains(" ") && !pieces.contains("|"))
    // costs are finite and positive (a proper smoothed distribution)
    assert(t1.forall { case (_, c) =>
      java.lang.Double.isFinite(c) && c > 0.0 })
    // the budget binds: singles + multis <= max(vocabSize, singles)
    val singles = t1.count(_._1.length == 1)
    assert(t1.size <= math.max(100, singles))
    // high-frequency substrings won a slot ('est' appears in 12
    // freq-weighted words; 'lo' in 10)
    assert(pieces.exists(p => p.length > 1),
      "EM kept no multi-char piece")
  }

  test("soft (forward-backward) EM retains mass-bearing pieces hard " +
    "EM starves, stays deterministic, and its table drives the same " +
    "kernel") {
    val dict = Seq(("join", 964L), ("hash", 947L), ("row", 943L),
      ("batch", 937L), ("customer", 934L), ("column", 934L),
      ("the", 900L), ("agg", 901L))
    // 93 forced singles leave 27 multi slots at vocabSize 120 —
    // room for all 8 whole words plus competitive sub-pieces
    val hard = Unigram.trainLocal(dict, 120)
    val soft = Unigram.trainLocal(dict, 120, soft = true)
    assert(soft == Unigram.trainLocal(dict, 120, soft = true),
      "soft EM must be deterministic")
    def multis(t: Seq[(String, Double)]): Set[String] =
      t.map(_._1).filter(_.length > 1).toSet
    // posterior mass keeps every whole word alive under soft EM;
    // hard EM's winner-take-all starves the longer words' competitors
    // to zero and (on this tiny dict) collapses deep
    assert(multis(soft).size >= multis(hard).size)
    assert(dict.map(_._1).toSet.subsetOf(multis(soft)),
      s"soft EM should retain all whole words, got ${multis(soft)}")
    // the soft table applies through the same Viterbi kernel: whole
    // words (cheapest pieces by construction) segment as themselves
    val k = UnigramKernel.forPieces(soft)
    assert(k.applyWord("customer").toSeq == Seq("customer"))
    assert(k.applyWord("join").toSeq == Seq("join"))
  }

  test("apply/decode round trip via Spark expressions; count " +
    "matches tokens length") {
    import spark.implicits._
    val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("lowest", 3L))
    val table = Unigram.trainLocal(dict, vocabSize = 100)
    val df = Seq("newest lowest", "low wider", "", "  spaced  out ")
      .toDF("text")
    val got = df.select(col("text"),
      Unigram.tokenCount(col("text"), table).as("n"),
      Unigram.tokens(col("text"), table).as("toks"),
      Unigram.decode(
        Unigram.tokenIds(col("text"), table), table).as("rt"))
      .collect()
    got.foreach { r =>
      val text = r.getString(0)
      assert(r.getLong(1) == r.getSeq[String](2).size.toLong)
      // ASCII round trip: decode == whitespace-stripped concatenation
      assert(r.getString(3) == text.split(" ").filter(_.nonEmpty)
        .mkString(""), s"round trip of '$text'")
      // tokens concatenate back to the words
      assert(r.getSeq[String](2).mkString("") ==
        text.split(" ").filter(_.nonEmpty).mkString(""))
    }
  }

  test("GatePieces is pinned, non-empty, and ASCII-covering — the " +
    "t134/t135 oracles replay these exact literals") {
    assert(Unigram.GatePieces.nonEmpty,
      "gate table must be pinned (tools.TrainUnigram output)")
    val pieces = Unigram.GatePieces.map(_._1).toSet
    assert((32 to 126).filterNot(c => c == ' ' || c == '|')
      .forall(c => pieces.contains(c.toChar.toString)))
    assert(Unigram.GatePieces.forall { case (p, c) =>
      !p.contains("|") && !p.contains(" ") &&
        java.lang.Double.isFinite(c)
    })
  }
}
