package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

import graft.expressions.{UnigramKernel, UnigramTokenCount, UnigramTokenIds, UnigramTokens}

/** Unigram-LM tokenizer (SentencePiece-style, Kudo 2018): corpus-
  * trained (piece, cost) table + native Viterbi apply — BPE's sibling
  * with the same train/apply/decode contract, so packing (t49) and
  * token budgets (t38) consume either tokenizer interchangeably.
  *
  * Training, like [[Bpe.train]], runs over the WORD DICTIONARY, not
  * the raw corpus: word frequencies are one distributed
  * `groupBy(word).count` (the only corpus-sized pass at 100 TB), the
  * top `maxWords` entries collect to the driver (bounded,
  * O(parameters)), and the EM loop runs locally:
  *
  *  1. SEED: every substring of length 2..`maxPieceLen`, counted
  *     freq-weighted across the dictionary; the top
  *     `vocabSize * 4` survive (count desc, piece asc) alongside the
  *     ALWAYS-KEPT singles — every printable-ASCII char plus every
  *     char present in the dictionary — so segmentation is total and
  *     ASCII decode round-trips regardless of what EM prunes.
  *  2. VITERBI-EM (`emIters` rounds): E-step segments each dictionary
  *     word under current costs (the kernel's exact tie-break:
  *     cost, then token count, then '|'-joined path) and accumulates
  *     freq-weighted piece usage; M-step re-derives
  *     cost = -ln((usage + 0.5) / Σ(usage + 0.5)) — add-half
  *     smoothing keeps never-used singles finite and the
  *     distribution proper. (Kudo's EM uses forward-backward expected
  *     counts; hard-EM on the Viterbi path is the documented
  *     simplification here — deterministic and oracle-replayable.)
  *  3. PRUNE between rounds: keep singles + the top
  *     `vocabSize - singles` multis by (usage desc, piece asc) —
  *     the expected-count criterion standing in for Kudo's
  *     likelihood-loss ranking.
  *
  * Determinism: every order above is total, so one dictionary yields
  * one table, bit for bit (UnigramSpec pins it).
  */
object Unigram {

  /** The pinned gate piece table: `tools.TrainUnigram
    * /root/testdata/sf0.01 160` output (trained on the sf0.01
    * documents corpus, defaults). Pinned as literals so the DuckDB
    * oracles replay the identical (piece, cost) table — retraining
    * inside the gate would make the oracle SQL depend on runtime
    * state. Regenerate with the tool after any trainer change. */
  val GatePieces: Seq[(String, Double)] = Seq(
    ("!", 10.905093223262087),
    ("\"", 10.905093223262087),
    ("#", 10.905093223262087),
    ("$", 10.905093223262087),
    ("%", 10.905093223262087),
    ("&", 10.905093223262087),
    ("'", 10.905093223262087),
    ("(", 10.905093223262087),
    (")", 10.905093223262087),
    ("*", 10.905093223262087),
    ("+", 10.905093223262087),
    (",", 10.905093223262087),
    ("-", 10.905093223262087),
    (".", 10.905093223262087),
    ("/", 10.905093223262087),
    ("0", 10.905093223262087),
    ("1", 10.905093223262087),
    ("2", 10.905093223262087),
    ("3", 10.905093223262087),
    ("4", 10.905093223262087),
    ("5", 10.905093223262087),
    ("6", 10.905093223262087),
    ("7", 10.905093223262087),
    ("8", 10.905093223262087),
    ("9", 10.905093223262087),
    (":", 10.905093223262087),
    (";", 10.905093223262087),
    ("<", 10.905093223262087),
    ("=", 10.905093223262087),
    (">", 10.905093223262087),
    ("?", 10.905093223262087),
    ("@", 10.905093223262087),
    ("A", 10.905093223262087),
    ("B", 10.905093223262087),
    ("C", 10.905093223262087),
    ("D", 10.905093223262087),
    ("E", 10.905093223262087),
    ("F", 10.905093223262087),
    ("G", 10.905093223262087),
    ("H", 10.905093223262087),
    ("I", 10.905093223262087),
    ("J", 10.905093223262087),
    ("K", 10.905093223262087),
    ("L", 10.905093223262087),
    ("M", 10.905093223262087),
    ("N", 10.905093223262087),
    ("O", 10.905093223262087),
    ("P", 10.905093223262087),
    ("Q", 10.905093223262087),
    ("R", 10.905093223262087),
    ("S", 10.905093223262087),
    ("T", 10.905093223262087),
    ("U", 10.905093223262087),
    ("V", 10.905093223262087),
    ("W", 10.905093223262087),
    ("X", 10.905093223262087),
    ("Y", 10.905093223262087),
    ("Z", 10.905093223262087),
    ("[", 10.905093223262087),
    ("\\", 10.905093223262087),
    ("]", 10.905093223262087),
    ("^", 10.905093223262087),
    ("_", 10.905093223262087),
    ("`", 10.905093223262087),
    ("a", 3.431456114765881),
    ("b", 10.905093223262087),
    ("c", 10.905093223262087),
    ("d", 10.905093223262087),
    ("e", 10.905093223262087),
    ("f", 10.905093223262087),
    ("g", 10.905093223262087),
    ("h", 10.905093223262087),
    ("i", 10.905093223262087),
    ("j", 10.905093223262087),
    ("k", 10.905093223262087),
    ("l", 10.905093223262087),
    ("m", 10.905093223262087),
    ("n", 10.905093223262087),
    ("o", 10.905093223262087),
    ("p", 10.905093223262087),
    ("q", 10.905093223262087),
    ("r", 10.905093223262087),
    ("s", 10.905093223262087),
    ("t", 10.905093223262087),
    ("u", 10.905093223262087),
    ("v", 10.905093223262087),
    ("w", 10.905093223262087),
    ("x", 10.905093223262087),
    ("y", 10.905093223262087),
    ("z", 10.905093223262087),
    ("{", 10.905093223262087),
    ("}", 10.905093223262087),
    ("~", 10.905093223262087),
    ("join", 3.340336210356358),
    ("hash", 3.35811910574556),
    ("row", 3.362349677893537),
    ("batch", 3.368729284857576),
    ("scan", 3.3697965208179985),
    ("column", 3.371934415806524),
    ("customer", 3.371934415806524),
    ("filter", 3.3730050797203646),
    ("small", 3.3783756619093808),
    ("merge", 3.389204138046961),
    ("slow", 3.389204138046961),
    ("order", 3.395757957245495),
    ("vector", 3.395757957245495),
    ("line", 3.3979521435344786),
    ("data", 3.400151154865916),
    ("table", 3.400151154865916),
    ("agg", 3.4078860000587694),
    ("value", 3.412332922339708),
    ("key", 3.413447749656954),
    ("stream", 3.422411395107436),
    ("window", 3.4246649171878794),
    ("spark", 3.431456114765881),
    ("group", 3.43373013507499),
    ("part", 3.43373013507499),
    ("big", 3.4360093383408525),
    ("sort", 3.4405833886255595),
    ("query", 3.441730177742066),
    ("fast", 3.4614295401464963),
    ("the", 3.477949089853471),
    ("dup", 6.934801309709965))

  /** Train a `vocabSize`-piece table from the corpus word dictionary.
    * `vocabSize` counts pieces only (specials <pad>/<unk> live in the
    * id space, not the table). `soft = true` switches the E-step
    * from hard (Viterbi-path) counts to forward-backward EXPECTED
    * counts — Kudo's actual EM; see [[trainLocal]]. */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      maxWords: Int = 50000, maxPieceLen: Int = 8,
      emIters: Int = 4, soft: Boolean = false): Seq[(String, Double)] = {
    require(vocabSize > 0 && maxWords > 0)
    val dict = df
      .select(explode(split(col(textCol), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainLocal(dict, vocabSize, maxPieceLen, emIters, soft)
  }

  /** The local EM loop over a (word, freq) dictionary — exposed for
    * spec-level verification against hand-computed examples.
    *
    * `soft = false` (the pinned-gate default) is hard EM: the E-step
    * segments each word on its single best Viterbi path (the apply
    * kernel itself, so train-time and apply-time segmentation cannot
    * drift) and counts pieces on that path. `soft = true` is Kudo's
    * forward-backward EM: the E-step accumulates each piece's
    * POSTERIOR expected count over ALL segmentations of each word
    * (log-domain alpha/beta over the segmentation lattice, fixed
    * traversal order → deterministic doubles) — pieces that lose the
    * argmax but carry probability mass keep nonzero counts, so soft
    * EM retains competitive sub-pieces that hard EM starves to zero
    * (UnigramSpec pins an example). Both modes share the seed, the
    * smoothing, and the (count desc, piece asc) prune. */
  def trainLocal(dict: Seq[(String, Long)], vocabSize: Int,
      maxPieceLen: Int = 8, emIters: Int = 4,
      soft: Boolean = false): Seq[(String, Double)] = {
    require(vocabSize > 0 && maxPieceLen >= 2 && emIters >= 1)
    // always-kept singles: printable ASCII + every dictionary char,
    // sorted by code point — total coverage of the training charset.
    // ' ' is excluded (words are space-split, it cannot occur) and
    // '|' is excluded (the reserved path separator of the Viterbi
    // tie-break; a literal '|' degrades to an <unk> step)
    val singles: Seq[String] =
      ((32 to 126).map(_.toChar) ++ dict.flatMap(_._1.toCharArray))
        .distinct.filterNot(c => c == ' ' || c == '|')
        .sorted.map(String.valueOf)
    // seed multis: substring counts, freq-weighted, all occurrences
    val seedCounts = new java.util.HashMap[String, Long]()
    dict.foreach { case (w, n) =>
      var i = 0
      while (i < w.length) {
        var len = 2
        while (len <= maxPieceLen && i + len <= w.length) {
          seedCounts.merge(w.substring(i, i + len), n, _ + _)
          len += 1
        }
        i += 1
      }
    }
    val seedBudget = math.max(0, vocabSize * 4 - singles.size)
    var multis: Seq[String] = {
      val buf = Seq.newBuilder[(String, Long)]
      seedCounts.forEach((p, n) => buf += ((p, n)))
      buf.result().sortBy { case (p, n) => (-n, p) }
        .take(seedBudget).map(_._1)
    }
    // initial usage = raw substring counts (singles: char counts)
    def charCounts: Map[String, Long] = {
      val m = new java.util.HashMap[String, Long]()
      dict.foreach { case (w, n) =>
        w.toCharArray.foreach(c =>
          m.merge(String.valueOf(c), n, _ + _))
      }
      val buf = Map.newBuilder[String, Long]
      m.forEach((k, v) => buf += (k -> v))
      buf.result()
    }
    var usage: Map[String, Double] =
      (charCounts ++ multis.map(p =>
        p -> seedCounts.get(p)).toMap).map { case (k, v) =>
        k -> v.toDouble
      }
    val keepMultis = math.max(0, vocabSize - singles.size)

    def toCosts(pieces: Seq[String],
        use: Map[String, Double]): Seq[(String, Double)] = {
      val smoothed = pieces.map(p =>
        p -> (use.getOrElse(p, 0.0) + 0.5))
      val total = smoothed.map(_._2).sum
      smoothed.map { case (p, s) => (p, math.log(total) - math.log(s)) }
    }

    var table: Seq[(String, Double)] = toCosts(singles ++ multis, usage)
    var it = 0
    while (it < emIters) {
      val em = new java.util.HashMap[String, java.lang.Double]()
      if (!soft) {
        // HARD E-step: Viterbi usage under current costs (the apply
        // kernel itself — train and apply cannot drift). Ephemeral:
        // one fresh table per iteration must not intern into the
        // JVM-global kernel pool.
        val kernel = UnigramKernel.ephemeral(table)
        dict.foreach { case (w, n) =>
          kernel.applyWord(w).foreach(t =>
            em.merge(t, java.lang.Double.valueOf(n.toDouble),
              (a, b) => java.lang.Double.valueOf(a + b)))
        }
      } else {
        // SOFT E-step: forward-backward posterior counts over the
        // segmentation lattice, log domain, fixed traversal order
        val costs = new java.util.HashMap[String, java.lang.Double]()
        table.foreach { case (p2, c2) =>
          if (!costs.containsKey(p2))
            costs.put(p2, java.lang.Double.valueOf(c2))
        }
        val maxLen = table.iterator.map(_._1.length).max
        val unkCost = table.iterator.map(_._2).max + 10.0
        def lse(a: Double, b: Double): Double =
          if (a == Double.NegativeInfinity) b
          else if (b == Double.NegativeInfinity) a
          else { val m = math.max(a, b); m + math.log1p(math.exp(-math.abs(a - b))) }
        dict.foreach { case (w, n) =>
          val L = w.length
          val alpha = Array.fill(L + 1)(Double.NegativeInfinity)
          val beta = Array.fill(L + 1)(Double.NegativeInfinity)
          alpha(0) = 0.0
          var j = 1
          while (j <= L) {
            var from = math.max(0, j - maxLen)
            while (from < j) {
              val piece = w.substring(from, j)
              val c: java.lang.Double = costs.get(piece)
              if (c != null || j - from == 1) {
                val lp = -(if (c != null) c.doubleValue() else unkCost)
                alpha(j) = lse(alpha(j), alpha(from) + lp)
              }
              from += 1
            }
            j += 1
          }
          beta(L) = 0.0
          var i0 = L - 1
          while (i0 >= 0) {
            var to = math.min(L, i0 + maxLen)
            while (to > i0) {
              val piece = w.substring(i0, to)
              val c: java.lang.Double = costs.get(piece)
              if (c != null || to - i0 == 1) {
                val lp = -(if (c != null) c.doubleValue() else unkCost)
                beta(i0) = lse(beta(i0), lp + beta(to))
              }
              to -= 1
            }
            i0 -= 1
          }
          val z = alpha(L)
          if (!z.isNegInfinity) {
            var jj = 1
            while (jj <= L) {
              var from = math.max(0, jj - maxLen)
              while (from < jj) {
                val piece = w.substring(from, jj)
                val c: java.lang.Double = costs.get(piece)
                if (c != null) { // unk edges carry mass, not counts
                  val post = math.exp(
                    alpha(from) - c.doubleValue() + beta(jj) - z)
                  em.merge(piece,
                    java.lang.Double.valueOf(n * post),
                    (a, b) => java.lang.Double.valueOf(a + b))
                }
                from += 1
              }
              jj += 1
            }
          }
        }
      }
      val buf = Map.newBuilder[String, Double]
      em.forEach((k, v) => buf += (k -> v.doubleValue()))
      usage = buf.result()
      // prune multis to the vocab budget by (usage desc, piece asc)
      multis = multis.map(p => (p, usage.getOrElse(p, 0.0)))
        .filter(_._2 > 0.0)
        .sortBy { case (p, n) => (-n, p) }
        .take(keepMultis).map(_._1)
      table = toCosts(singles ++ multis, usage)
      it += 1
    }
    table
  }

  /** Vocabulary induced by a piece table: ids 0/1 are `<pad>`/`<unk>`
    * specials, then the pieces in table order — the id space
    * [[tokenIds]] emits and the sequence packer stores. */
  def vocab(pieces: Seq[(String, Double)]): Seq[String] =
    Seq("<pad>", "<unk>") ++ pieces.map(_._1)

  /** Viterbi token ids of `text` under a piece table. */
  def tokenIds(text: Column, pieces: Seq[(String, Double)]): Column =
    GraftColumnBridge.column(
      UnigramTokenIds(GraftColumnBridge.expression(text), pieces))

  /** DETOKENIZE — same contract as [[Bpe.decode]]: map ids back to
    * vocab strings and concatenate; out-of-range ids surface as the
    * visible sentinel. decode(tokenIds(text)) reconstructs the
    * whitespace-stripped concatenation for text fully covered by the
    * table's charset (always true of ASCII — singles are forced into
    * the table; the t134 gate pins it cross-engine). */
  def decode(ids: Column, pieces: Seq[(String, Double)]): Column = {
    val v = vocab(pieces)
    array_join(
      transform(ids, i =>
        when(i >= 0 && i < lit(v.size),
          element_at(array(v.map(lit): _*), (i + lit(1)).cast("int")))),
      "", "�")
  }

  /** Viterbi token count of `text` under a piece table. */
  def tokenCount(text: Column, pieces: Seq[(String, Double)]): Column =
    GraftColumnBridge.column(
      UnigramTokenCount(GraftColumnBridge.expression(text), pieces))

  /** Viterbi token array of `text` under a piece table. */
  def tokens(text: Column, pieces: Seq[(String, Double)]): Column =
    GraftColumnBridge.column(
      UnigramTokens(GraftColumnBridge.expression(text), pieces))

  /** DuckDB replay of Viterbi segmentation for a (doc_id, text)
    * relation whose text is fully covered by the table (ASCII after
    * the gate's octet-length filter): a recursive CTE enumerates
    * every segmentation of each DISTINCT word — extensions join the
    * piece table on the matching substring, costs accumulate left to
    * right (the kernel's exact addition order, so doubles compare
    * bit-identically) — and the winner per word is
    * min(cost, ntok, path). Ends with `__ug_doc` =
    * (doc_id, path, n_tokens): the '|'-joined per-doc token sequence
    * and its length. */
  def duckSql(pieces: Seq[(String, Double)], docsRel: String,
      idCol: String, textCol: String): String = {
    val vals = pieces.map { case (p, c) =>
      "('" + p.replace("'", "''") + "', " + c + ")"
    }.mkString(", ")
    s"""__ug_pieces(p, c) AS (VALUES $vals),
       |__ug_words AS (
       |  SELECT DISTINCT w FROM (
       |    SELECT unnest(string_split($textCol, ' ')) AS w
       |    FROM $docsRel) WHERE len(w) > 0),
       |__ug_rec AS (
       |  SELECT w, 0 AS pos, CAST(0 AS DOUBLE) AS cost,
       |      0 AS ntok, '' AS path
       |    FROM __ug_words
       |  UNION ALL
       |  SELECT r.w, r.pos + len(x.p), r.cost + x.c, r.ntok + 1,
       |      CASE WHEN r.path = '' THEN x.p
       |        ELSE r.path || '|' || x.p END
       |    FROM __ug_rec r JOIN __ug_pieces x
       |      ON x.p = r.w[r.pos + 1 : r.pos + len(x.p)]
       |    WHERE r.pos < len(r.w)),
       |__ug_best AS (
       |  SELECT w, path, ntok FROM (
       |    SELECT w, path, ntok, row_number() OVER (
       |        PARTITION BY w ORDER BY cost ASC, ntok ASC, path ASC
       |      ) AS rn
       |    FROM __ug_rec WHERE pos = len(w))
       |  WHERE rn = 1),
       |__ug_doc AS (
       |  SELECT d.$idCol,
       |    COALESCE(string_agg(b.path, '|' ORDER BY dw.o), '') AS path,
       |    COALESCE(SUM(b.ntok), 0) AS n_tokens
       |  FROM $docsRel d
       |  LEFT JOIN (
       |    SELECT $idCol, w, o FROM (
       |      SELECT $idCol, unnest(ws) AS w,
       |          unnest(range(1, len(ws) + 1)) AS o
       |      FROM (SELECT $idCol, string_split($textCol, ' ') AS ws
       |            FROM $docsRel)) WHERE len(w) > 0) dw USING ($idCol)
       |  LEFT JOIN __ug_best b ON b.w = dw.w
       |  GROUP BY d.$idCol)""".stripMargin
  }
}
