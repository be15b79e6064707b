package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding apply kernel: the canonical greedy procedure
  * (Sennrich 2016 / GPT-2 `bpe()`): repeatedly find the LOWEST-RANK
  * adjacent symbol pair present in the word and merge its LEFTMOST
  * occurrence, until no adjacent pair has a rank. Token count of a
  * text = Σ over whitespace-separated words of the word's final
  * symbol count.
  *
  * Pre-tokenization is the pipeline's whitespace convention
  * ([[graft.functions.TextOps.tokens]]): split on ' ', empty words
  * skipped — so merges may learn punctuation fusions, and the BPE
  * count is always ≤ Σ word lengths and ≥ whitespace token count.
  *
  * Per-word results memoize in a bounded per-kernel cache: corpus word
  * frequency is Zipfian, so the hot path is a hash lookup, not the
  * merge loop. One kernel instance exists per distinct merge table per
  * JVM ([[BpeKernel.forMerges]]), so executor caches are shared across
  * tasks and queries.
  */
final class BpeKernel private (mergeList: Array[String])
    extends Serializable {

  // ranks: "x y" -> rank (lower merges first)
  @transient private lazy val ranks: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int](mergeList.length * 2)
    var i = 0
    while (i < mergeList.length) { m.put(mergeList(i), i); i += 1 }
    m
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val MaxCacheEntries = 1 << 20

  /** BPE symbols of one word (no spaces inside `word`). */
  def applyWord(word: String): Array[String] = {
    if (word.length <= 1) return Array(word)
    val hit = cache.get(word)
    if (hit != null) return hit
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) { // chars; corpus contract is BMP text
      syms.add(String.valueOf(word.charAt(i)))
      i += 1
    }
    var done = false
    while (!done && syms.size > 1) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var p = 0
      while (p < syms.size - 1) {
        val r = ranks.getOrDefault(syms.get(p) + " " + syms.get(p + 1),
          Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPos = p }
        p += 1
      }
      if (bestPos < 0) done = true
      else {
        syms.set(bestPos, syms.get(bestPos) + syms.get(bestPos + 1))
        syms.remove(bestPos + 1)
      }
    }
    val out = syms.toArray(new Array[String](syms.size))
    if (cache.size < MaxCacheEntries) cache.put(word, out)
    out
  }

  /** Total BPE token count of a whitespace-joined text. */
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

  // vocab-id lookup for tokenIdArray — built against the SAME merge
  // table, so every merge product resolves; only non-ASCII atoms fall
  // through to <unk> (id 1). putIfAbsent = FIRST occurrence wins,
  // matching Bpe.vocab's indexOf and the oracle's list_position when
  // two merges concatenate to the same product string.
  @transient private lazy val vocabIds: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    var id = 2
    var c = 32
    while (c <= 126) { m.put(c.toChar.toString, id); id += 1; c += 1 }
    var i = 0
    while (i < mergeList.length) {
      m.putIfAbsent(mergeList(i).replace(" ", ""), id); id += 1; i += 1
    }
    m
  }

  // Executor-side deserialization routes back through the pool: the
  // expression ships the kernel via plan references, and WITHOUT this
  // every task would deserialize a private instance with a cold memo
  // cache — the per-JVM sharing the design claims would hold only on
  // the driver.
  private def readResolve(): Object = BpeKernel.forMergeList(mergeList)

  /** Token ids of a whitespace-joined text in [[vocabIds]]' space
    * (0 = pad, 1 = unk). */
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

  /** All BPE tokens of a whitespace-joined text, in order. */
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

object BpeKernel {
  // one kernel (→ one memo cache) per distinct merge table per JVM —
  // keyed by the canonical "a b" list so driver construction and
  // executor readResolve land on the same instance
  private val pool =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], BpeKernel]()

  def forMerges(merges: Seq[(String, String)]): BpeKernel = {
    require(merges.forall { case (a, b) =>
      a.nonEmpty && b.nonEmpty && !a.contains(" ") && !b.contains(" ")
    }, "BPE merge symbols must be non-empty and space-free")
    forMergeList(merges.map { case (a, b) => a + " " + b }.toArray)
  }

  private[expressions] def forMergeList(list: Array[String]): BpeKernel =
    pool.computeIfAbsent(list.toSeq, _ => new BpeKernel(list))
}

/** `bpe_token_count(text)`: LONG count of BPE tokens under a fixed
  * merge table. Codegen'd as a single static-style kernel call, so the
  * projection stays inside whole-stage codegen. */
case class BpeTokenCount(child: Expression,
    merges: Seq[(String, String)]) extends UnaryExpression {

  @transient private lazy val kernel = BpeKernel.forMerges(merges)

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_token_count requires STRING input, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    kernel.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeKernel", kernel,
      classOf[BpeKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeTokenCount = copy(child = newChild)
}

/** `bpe_token_ids(text)`: ARRAY<INT> of vocabulary ids
  * ([[graft.functions.Bpe.vocab]] space: 0 pad, 1 unk, ASCII atoms,
  * merge products by rank) — what the sequence packer stores. */
case class BpeTokenIds(child: Expression,
    merges: Seq[(String, String)]) extends UnaryExpression {

  @transient private lazy val kernel = BpeKernel.forMerges(merges)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType,
      containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_token_ids"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_token_ids requires STRING input, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    kernel.tokenIdArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeKernel", kernel,
      classOf[BpeKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.tokenIdArray($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeTokenIds = copy(child = newChild)
}

/** `bpe_tokens(text)`: the token array itself (spec/debug surface —
  * the count path never materializes it). */
case class BpeTokens(child: Expression,
    merges: Seq[(String, String)]) extends UnaryExpression {

  @transient private lazy val kernel = BpeKernel.forMerges(merges)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_tokens requires STRING input, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    kernel.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeKernel", kernel,
      classOf[BpeKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.tokenize($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeTokens = copy(child = newChild)
}
