package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_bounds(text)`: content-defined chunk boundary END
  * positions (1-based) via a Rabin window fingerprint — the O(1)-per-
  * position production variant of [[graft.operators.Chunk]]'s
  * md5-window predicate. Position i (window ≤ i < len) is a boundary
  * iff
  *
  *   H(i) = Σ_{j=0..w-1} code(c_{i-w+1+j}) · B^{w-1-j}  mod P  ≡ 0
  *                                                      (mod modulus)
  *
  * maintained incrementally: H(i+1) = (H(i) − c_out·B^{w-1})·B + c_in
  * (mod P) — one multiply-add per character regardless of window
  * size, where the md5 variant pays a full digest per position. The
  * constants are [[graft.functions.TextOps.RollingB]]/`RollingP`
  * (h < P < 2³¹, B·h + c < 2³⁶ — no long overflow), and `code` is the
  * char code (the same `ascii`-of-char the oracle mirrors; corpus
  * contract is BMP text, matching the BPE kernel).
  *
  * The boundary at len is excluded (it would only split off an empty
  * tail) and texts of length ≤ window yield no boundaries — identical
  * contract to the md5 predicate, so
  * [[graft.operators.Chunk.contentDefinedChunksRolling]] slices with
  * the same downstream code.
  */
object RollingBoundsHelper {
  import graft.functions.TextOps.{RollingB => B, RollingP => P}

  def compute(text: UTF8String, window: Int, modulus: Int): GenericArrayData = {
    val s = text.toString
    val n = s.length
    if (n <= window) return new GenericArrayData(Array.empty[Int])
    // B^(w-1) mod P for the outgoing-character subtraction
    var bw = 1L
    var j = 1
    while (j < window) { bw = bw * B % P; j += 1 }
    val out = new java.util.ArrayList[Integer]()
    var h = 0L
    var i = 0
    while (i < n) {
      // invariant entering iteration i (for i >= window): h is the
      // window hash of chars [i-window, i-1] — retire the outgoing
      // char (coefficient B^{w-1}) BEFORE scaling in the new one
      if (i >= window)
        h = (h - s.charAt(i - window) * bw % P + P) % P
      h = (h * B + s.charAt(i)) % P
      // 1-based end position of the current window is i+1; exclude len
      if (i + 1 >= window && i + 1 < n && h % modulus == 0)
        out.add(i + 1)
      i += 1
    }
    val arr = new Array[Any](out.size)
    var k = 0
    while (k < out.size) { arr(k) = out.get(k).intValue(); k += 1 }
    new GenericArrayData(arr)
  }
}

case class RollingBounds(child: Expression, window: Int, modulus: Int)
    extends UnaryExpression {

  require(window >= 1 && modulus >= 1)

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_bounds"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rolling_bounds requires STRING input, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    RollingBoundsHelper.compute(input.asInstanceOf[UTF8String],
      window, modulus)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.RollingBoundsHelper.compute($c, $window, $modulus)")

  override protected def withNewChildInternal(
      newChild: Expression): RollingBounds = copy(child = newChild)
}
