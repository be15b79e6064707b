package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

import graft.expressions.{BpeTokenCount, BpeTokens}

/** Byte-pair encoding: corpus-trained merges + native apply.
  *
  * Training is the classic Sennrich (2016) procedure over a WORD
  * DICTIONARY, not the raw corpus: word frequencies are a distributed
  * `groupBy(word).count` (one narrow shuffle of (word, count) rows —
  * at 100 TB this is the only corpus-sized pass), the top `maxWords`
  * dictionary entries collect to the driver (bounded — O(parameters),
  * like the ANN codebooks), and the merge loop runs locally over that
  * dictionary. This is how production tokenizers are actually trained:
  * the dictionary truncation only drops the Zipf tail, whose pair
  * counts cannot outvote the head.
  *
  * Apply is [[graft.expressions.BpeTokenCount]] /
  * [[graft.expressions.BpeTokens]] — a codegen'd native kernel with a
  * per-JVM memoized word cache, never a UDF.
  *
  * Determinism contract (both directions of the t03/t33/t38 gates):
  * pair counts break ties lexicographically; merges apply
  * lowest-rank-first to the leftmost occurrence. [[GateMerges]] pins
  * the table trained on the sf0.01 documents corpus (64 merges,
  * maxWords default) so the DuckDB oracles replay the identical table
  * as literals.
  */
object Bpe {

  /** The pinned gate merge table: `tools.TrainBpe /root/testdata/sf0.01
    * 64` output (trained on the sf0.01 documents corpus, full
    * dictionary). Pinned as a constant so the DuckDB oracles replay the
    * identical table as literals — retraining inside the gate query
    * would make the oracle SQL depend on runtime state. */
  val GateMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"),
    ("s", "mall"), ("g", "e"), ("l", "ow"), ("mer", "ge"),
    ("s", "low"), ("c", "t"), ("ct", "or"), ("d", "er"),
    ("e", "ctor"), ("or", "der"), ("v", "ector"), ("in", "e"),
    ("l", "ine"), ("a", "b"), ("ab", "l"), ("abl", "e"), ("at", "a"),
    ("d", "ata"), ("t", "able"), ("u", "p"), ("a", "g"), ("ag", "g"),
    ("a", "lu"), ("alu", "e"), ("v", "alue"), ("e", "y"), ("k", "ey"))

  /** Train `numMerges` BPE merges from the corpus' word dictionary.
    * Deterministic: ties in pair frequency break on the
    * lexicographically smaller (left, right) pair; dictionary
    * truncation orders by (count desc, word asc). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 50000): Seq[(String, String)] = {
    require(numMerges > 0 && maxWords > 0)
    val dict = df
      .select(explode(split(col(textCol), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainLocal(dict, numMerges)
  }

  /** The local merge loop over a (word, freq) dictionary — exposed for
    * spec-level verification against hand-computed examples. */
  def trainLocal(dict: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    // mutable word representations: each word is its symbol list
    var words: Seq[(Array[String], Long)] = dict.map { case (w, n) =>
      (w.toCharArray.map(String.valueOf), n)
    }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), n, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: (String, String) = null
        var bestN = -1L
        counts.forEach { (pair, n) =>
          if (n > bestN || (n == bestN &&
              (pair._1 < best._1 ||
                (pair._1 == best._1 && pair._2 < best._2)))) {
            best = pair; bestN = n
          }
        }
        // frequency-1 pairs are dictionary noise, not vocabulary
        if (bestN < 2) exhausted = true
        else {
          merges += best
          val fused = best._1 + best._2
          words = words.map { case (syms, n) =>
            if (syms.length < 2) (syms, n)
            else {
              val out = new java.util.ArrayList[String](syms.length)
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == best._1 &&
                    syms(i + 1) == best._2) {
                  out.add(fused); i += 2
                } else { out.add(syms(i)); i += 1 }
              }
              (out.toArray(new Array[String](out.size)), n)
            }
          }
        }
      }
      m += 1
    }
    merges.result()
  }

  /** Vocabulary induced by a merge table: ids 0/1 are the `<pad>` /
    * `<unk>` specials, then the printable-ASCII atoms (codes 32–126)
    * in code order, then the merge products in rank order. Total and
    * deterministic: any token not in the table (non-ASCII atom) maps
    * to `<unk>`. This is the id space [[tokenIds]] emits and the
    * sequence packer stores. */
  def vocab(merges: Seq[(String, String)]): Seq[String] =
    Seq("<pad>", "<unk>") ++
      (32 to 126).map(c => c.toChar.toString) ++
      merges.map { case (a, b) => a + b }

  /** BPE token ids of `text` under a merge table ([[vocab]] id
    * space) — the sequence-packing input. */
  def tokenIds(text: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(
      graft.expressions.BpeTokenIds(
        GraftColumnBridge.expression(text), merges))

  /** DETOKENIZE: map each [[tokenIds]] id back to its [[vocab]]
    * string and concatenate — the inverse direction every tokenizer
    * owes its pipeline (inspect packed sequences, audit samples,
    * reconstruct spans). Pure builtin expression over a literal
    * vocab array (O(vocab) constants in the plan, row-local apply).
    * Round-trip contract: decode(tokenIds(text)) reconstructs the
    * concatenation of text's whitespace-split words for ASCII text —
    * the word delimiter is consumed by the pre-split and `<unk>`
    * absorbs non-ASCII atoms, both documented apply-side properties
    * (the t107 gate pins the ASCII round trip cross-engine). */
  def decode(ids: Column, merges: Seq[(String, String)]): Column = {
    val v = vocab(merges)
    // Out-of-vocab ids (corrupt stream, foreign vocab) must surface as
    // a visible sentinel, never vanish: an unguarded element_at would
    // NULL ids ≥ size (then array_join silently DROPS them), error on
    // id = -1 (SQL index 0), and alias id < -1 to a from-the-end
    // lookup. Guard the range explicitly; the nullReplacement arm
    // additionally covers NULL ids in the input array.
    array_join(
      transform(ids, i =>
        when(i >= 0 && i < lit(v.size),
          element_at(array(v.map(lit): _*), (i + lit(1)).cast("int")))),
      "", "�")
  }

  /** BPE token count of `text` under a merge table. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(
      BpeTokenCount(GraftColumnBridge.expression(text), merges))

  /** BPE token array of `text` under a merge table. */
  def tokens(text: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(
      BpeTokens(GraftColumnBridge.expression(text), merges))

  /** DuckDB replay of the apply procedure for a (doc_id, text)
    * relation: a recursive CTE over the DISTINCT word dictionary that
    * merges the leftmost lowest-rank pair one step at a time (list
    * lengths strictly decrease, so `min(len)` per word is the final
    * token count), joined back to documents. Emitted by oracle
    * builders so gates verify the SAME merge table cross-engine. */
  def duckSql(merges: Seq[(String, String)], docsRel: String,
      idCol: String, textCol: String): String = {
    val ml = merges.map { case (a, b) =>
      "'" + (a + " " + b).replace("'", "''") + "'"
    }.mkString("[", ", ", "]")
    s"""__bpe_words AS (
       |  SELECT DISTINCT w FROM (
       |    SELECT unnest(string_split($textCol, ' ')) AS w
       |    FROM $docsRel) WHERE len(w) > 0),
       |__bpe_rec AS (
       |  SELECT w, string_split(w, '') AS s FROM __bpe_words
       |  UNION ALL
       |  SELECT w, list_concat(list_concat(
       |      s[:p - 1], [s[p] || s[p + 1]]), s[p + 2:]) AS s
       |  FROM (
       |    SELECT w, s, list_position(pr, list_min(pr)) AS p
       |    FROM (
       |      SELECT w, s, list_transform(range(1, len(s)),
       |        i -> coalesce(nullif(list_position($ml,
       |               s[i] || ' ' || s[i + 1]), 0), 9999999)) AS pr
       |      FROM __bpe_rec WHERE len(s) > 1)
       |    WHERE list_min(pr) < 9999999)),
       |__bpe_wc AS (
       |  SELECT w, MIN(len(s)) AS c FROM __bpe_rec GROUP BY w),
       |__bpe_counts AS (
       |  SELECT d.$idCol, COALESCE(SUM(wc.c), 0) AS n_tokens
       |  FROM $docsRel d
       |  LEFT JOIN (
       |    SELECT $idCol, w FROM (
       |      SELECT $idCol, unnest(string_split($textCol, ' ')) AS w
       |      FROM $docsRel) WHERE len(w) > 0) dw USING ($idCol)
       |  LEFT JOIN __bpe_wc wc ON wc.w = dw.w
       |  GROUP BY d.$idCol)""".stripMargin
  }
}
