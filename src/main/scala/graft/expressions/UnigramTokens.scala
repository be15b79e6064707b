package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style, Kudo 2018) apply kernel: Viterbi
  * segmentation of each whitespace word under a fixed (piece, cost)
  * table, cost = -ln p(piece). The BPE kernel's sibling — same
  * pre-tokenization convention ([[graft.functions.TextOps.tokens]]:
  * split on ' ', empty words skipped), same per-JVM pooled instance
  * with a bounded per-word memo cache, same codegen'd single-call
  * expressions — so the sequence packer (t49) and token-budget
  * queries (t38) consume either tokenizer through one shape.
  *
  * DETERMINISM CONTRACT (what the t135 oracle replays path by path):
  * the best segmentation minimizes, in lexicographic order,
  * (total cost, token count, '|'-joined piece string). Costs
  * accumulate LEFT TO RIGHT along the path — the same IEEE addition
  * sequence the oracle's recursive enumeration performs, so double
  * comparisons agree bit-exactly cross-engine. A position where no
  * piece matches (character outside the trained charset) consumes
  * one char as an `<unk>` step at [[UnigramKernel.unkCost]] — a
  * table-derived constant, max piece cost + 10, so unk is never
  * preferred over any real piece.
  *
  * RESIDUAL FP CAVEAT: the DP keeps ONE best prefix per position
  * under (cost, ntok, path). IEEE addition is only weakly monotone,
  * so two prefixes with strictly different costs can in principle
  * round to the SAME total after an identical suffix — an exhaustive
  * enumerator would then tie-break on (ntok, path) over a prefix
  * this DP already discarded. The divergence requires a table whose
  * cost sums collide to the bit after differing at a prefix —
  * unobserved under the trained (log-ratio) tables the gates use,
  * and impossible when all piece costs are exactly representable
  * multiples of 2^-k (use such tables where bit-exact cross-engine
  * replay of hand-built vocabularies matters).
  */
final class UnigramKernel private (pieceList: Array[String],
    costList: Array[Double]) extends Serializable {

  // values BOXED deliberately: a primitive-valued java.util.HashMap
  // unboxes a missing key's null to 0.0, silently making every
  // substring a free piece (the bug class the UnigramSpec DP pins)
  @transient private lazy val costs: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](
      pieceList.length * 2)
    var i = 0
    while (i < pieceList.length) {
      // first occurrence wins, matching vocabIds and list_position
      if (!m.containsKey(pieceList(i)))
        m.put(pieceList(i), java.lang.Double.valueOf(costList(i)))
      i += 1
    }
    m
  }

  @transient private lazy val maxPieceLen: Int = {
    var mx = 1
    var i = 0
    while (i < pieceList.length) {
      if (pieceList(i).length > mx) mx = pieceList(i).length
      i += 1
    }
    mx
  }

  /** Unknown-character step cost: strictly worse than every real
    * piece, deterministic from the table alone (the oracle embeds the
    * same literal). */
  val unkCost: Double = {
    var mx = 0.0
    var i = 0
    while (i < costList.length) {
      if (costList(i) > mx) mx = costList(i)
      i += 1
    }
    mx + 10.0
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val MaxCacheEntries = 1 << 20

  /** Viterbi tokens of one word under the (cost, ntok, path) order. */
  def applyWord(word: String): Array[String] = {
    val hit = cache.get(word)
    if (hit != null) return hit
    val n = word.length
    // per-position best: cost, token count, and the token list (the
    // '|'-joined form is the tie-break key; comparisons are rare —
    // only on exact double cost ties — so strings are built lazily)
    val bCost = new Array[Double](n + 1)
    val bNtok = new Array[Int](n + 1)
    val bPath = new Array[List[String]](n + 1)
    bPath(0) = Nil
    var j = 1
    while (j <= n) {
      var haveBest = false
      var from = j - 1
      val lo = math.max(0, j - maxPieceLen)
      while (from >= lo) {
        if (bPath(from) != null) {
          val piece = word.substring(from, j)
          val c: java.lang.Double = costs.get(piece)
          if (c != null || j - from == 1) {
            val stepCost = if (c != null) c.doubleValue() else unkCost
            val cand = bCost(from) + stepCost
            val candN = bNtok(from) + 1
            val better =
              if (!haveBest) true
              else if (cand != bCost(j)) cand < bCost(j)
              else if (candN != bNtok(j)) candN < bNtok(j)
              else pathStr(piece :: bPath(from)) < pathStr(bPath(j))
            if (better) {
              bCost(j) = cand; bNtok(j) = candN
              bPath(j) = piece :: bPath(from)
              haveBest = true
            }
          }
        }
        from -= 1
      }
      j += 1
    }
    val out = bPath(n).reverse.toArray
    if (cache.size < MaxCacheEntries) cache.put(word, out)
    out
  }

  // tokens are stored reversed (head = last piece); the tie-break
  // order is on the FORWARD '|'-join
  private def pathStr(rev: List[String]): String =
    rev.reverse.mkString("|")

  /** Total unigram token count of a whitespace-joined text. */
  def countTokens(text: UTF8String): Long = {
    val s = text.toString
    var total = 0L
    var start = 0
    val n = s.length
    while (start < n) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = n
      if (end > start) total += applyWord(s.substring(start, end)).length
      start = end + 1
    }
    total
  }

  // vocab ids: 0 pad, 1 unk, then pieces in table order (first
  // occurrence wins on duplicates) — graft.functions.Unigram.vocab's
  // id space
  @transient private lazy val vocabIds: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < pieceList.length) {
      m.putIfAbsent(pieceList(i), i + 2); i += 1
    }
    m
  }

  private def readResolve(): Object =
    UnigramKernel.forLists(pieceList, costList)

  /** Token ids of a whitespace-joined text (0 pad, 1 unk). */
  def tokenIdArray(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[Integer]()
    var start = 0
    val n = s.length
    while (start < n) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = n
      if (end > start) {
        val toks = applyWord(s.substring(start, end))
        var i = 0
        while (i < toks.length) {
          out.add(vocabIds.getOrDefault(toks(i), 1)); i += 1
        }
      }
      start = end + 1
    }
    val arr = new Array[Any](out.size)
    var k = 0
    while (k < out.size) { arr(k) = out.get(k).intValue(); k += 1 }
    new GenericArrayData(arr)
  }

  /** All unigram tokens of a whitespace-joined text, in order. */
  def tokenize(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[AnyRef]()
    var start = 0
    val n = s.length
    while (start < n) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = n
      if (end > start) {
        val toks = applyWord(s.substring(start, end))
        var i = 0
        while (i < toks.length) {
          out.add(UTF8String.fromString(toks(i))); i += 1
        }
      }
      start = end + 1
    }
    new GenericArrayData(out.toArray)
  }
}

object UnigramKernel {
  // one kernel (→ one memo cache) per distinct piece table per JVM
  private val pool = new java.util.concurrent.ConcurrentHashMap[
    (Seq[String], Seq[Double]), UnigramKernel]()

  def forPieces(pieces: Seq[(String, Double)]): UnigramKernel = {
    validate(pieces)
    forLists(pieces.map(_._1).toArray, pieces.map(_._2).toArray)
  }

  /** Non-pooled kernel for short-lived tables. The trainer's E-step
    * builds a fresh table per EM iteration; interning those in the
    * JVM-global pool would pin one kernel (each with an up-to-2^20
    * entry word cache) per iteration per training call forever. */
  private[graft] def ephemeral(
      pieces: Seq[(String, Double)]): UnigramKernel = {
    validate(pieces)
    new UnigramKernel(pieces.map(_._1).toArray,
      pieces.map(_._2).toArray)
  }

  private def validate(pieces: Seq[(String, Double)]): Unit =
    require(pieces.forall { case (p, c) =>
      p.nonEmpty && !p.contains(" ") && !p.contains("|") &&
        java.lang.Double.isFinite(c)
    }, "unigram pieces must be non-empty, space/pipe-free, finite-cost")

  private[expressions] def forLists(pieces: Array[String],
      costs: Array[Double]): UnigramKernel =
    pool.computeIfAbsent((pieces.toSeq, costs.toSeq),
      _ => new UnigramKernel(pieces, costs))
}

/** `unigram_token_count(text)`: LONG Viterbi token count under a fixed
  * (piece, cost) table — codegen'd single kernel call. */
case class UnigramTokenCount(child: Expression,
    pieces: Seq[(String, Double)]) extends UnaryExpression {

  @transient private lazy val kernel = UnigramKernel.forPieces(pieces)

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_token_count"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unigram_token_count requires STRING input, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    kernel.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugKernel", kernel,
      classOf[UnigramKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramTokenCount = copy(child = newChild)
}

/** `unigram_token_ids(text)`: ARRAY<INT> of vocabulary ids
  * ([[graft.functions.Unigram.vocab]] space: 0 pad, 1 unk, pieces by
  * table order) — the sequence-packing input. */
case class UnigramTokenIds(child: Expression,
    pieces: Seq[(String, Double)]) extends UnaryExpression {

  @transient private lazy val kernel = UnigramKernel.forPieces(pieces)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType,
      containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_token_ids"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unigram_token_ids requires STRING input, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    kernel.tokenIdArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugKernel", kernel,
      classOf[UnigramKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.tokenIdArray($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramTokenIds = copy(child = newChild)
}

/** `unigram_tokens(text)`: the token array itself (t135's segmentation
  * surface; the count path never materializes it). */
case class UnigramTokens(child: Expression,
    pieces: Seq[(String, Double)]) extends UnaryExpression {

  @transient private lazy val kernel = UnigramKernel.forPieces(pieces)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unigram_tokens requires STRING input, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    kernel.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugKernel", kernel,
      classOf[UnigramKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.tokenize($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramTokens = copy(child = newChild)
}
