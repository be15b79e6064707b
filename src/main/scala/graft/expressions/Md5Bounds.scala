package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_bounds(text)`: content-defined chunk boundary END positions
  * (1-based) under the md5-window predicate — the r12-optimization
  * native form of [[graft.operators.Chunk]]'s original HOF pipeline
  *
  *   filter(sequence(window, len-1),
  *     i => conv(substring(md5(substring(text, i-(w-1), w)), 1, 8),
  *               16, 10) % modulus = 0)
  *
  * Position i (window ≤ i ≤ len−1, code-point counted like Spark's
  * `substring`/`length`) is a boundary iff the first four MD5 digest
  * bytes of the trailing `window`-code-point slice, read as a
  * big-endian unsigned 32-bit integer (exactly what
  * `conv(substring(hex, 1, 8), 16, 10)` parses), are ≡ 0 mod
  * `modulus`. The boundary at len is excluded (it would only split
  * off an empty tail); texts of length ≤ window yield no boundaries —
  * the same contract as [[RollingBounds]], so
  * [[graft.operators.Chunk]] slices with the same downstream code and
  * the t45 oracle replays positions unchanged.
  *
  * Why native: the HOF form paid, per character position, an
  * interpreted lambda dispatch, a window-substring allocation, a full
  * 32-char hex encoding of the digest, a hex substring, and a base-16
  * string parse — all to compare 4 digest bytes against a modulus.
  * This loop walks the UTF-8 bytes once (code-point boundaries), runs
  * the (JIT-intrinsified) digest per window directly over the byte
  * slice, and never materializes hex. Identical boundary positions by
  * construction: `substring` re-encodes to the same UTF-8 bytes the
  * offset walk slices, and the numeric fold equals the hex parse.
  */
object Md5BoundsHelper {

  def compute(text: UTF8String, window: Int, modulus: Int): GenericArrayData = {
    val bytes = text.getBytes
    val blen = bytes.length
    // code-point start offsets; offs(k) = byte index of code point k,
    // with offs(nChars) = blen as the terminal sentinel
    var nChars = 0
    var i = 0
    while (i < blen) {
      nChars += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    if (nChars <= window) return new GenericArrayData(Array.empty[Int])
    val offs = new Array[Int](nChars + 1)
    var k = 0
    i = 0
    while (i < blen) {
      offs(k) = i
      k += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(nChars) = blen
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new java.util.ArrayList[Integer]()
    // 1-based end positions p in [window, nChars-1]: window covers
    // code points [p-window+1, p] = bytes [offs(p-window), offs(p))
    var p = window
    while (p < nChars) {
      val from = offs(p - window)
      val until = offs(p)
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      val head = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      if (head % modulus == 0) out.add(p)
      p += 1
    }
    val arr = new Array[Any](out.size)
    var j = 0
    while (j < out.size) { arr(j) = out.get(j).intValue(); j += 1 }
    new GenericArrayData(arr)
  }
}

case class Md5Bounds(child: Expression, window: Int, modulus: Int)
    extends UnaryExpression {

  require(window >= 1 && modulus >= 1)

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_bounds"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_bounds requires STRING input, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Md5BoundsHelper.compute(input.asInstanceOf[UTF8String],
      window, modulus)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.Md5BoundsHelper.compute($c, $window, $modulus)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Bounds = copy(child = newChild)
}
