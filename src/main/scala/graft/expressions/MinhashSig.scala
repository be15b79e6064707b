package graft.expressions

import graft.functions.TextOps
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression computing the full k-permutation MinHash
  * signature of a shingle array in ONE pass over the digest bytes.
  *
  * Bit-equal to the composed recipe the t07 oracle pins —
  * `transform(sh, x -> conv(substring(md5(x),1,8),16,10))` followed by
  * the k-slot `aggregate` fold of `(A_k·h + B_k) mod P` minima — but
  * without any of its per-shingle allocations: the composed form
  * materializes a 32-char hex string per shingle, re-parses 8 chars of
  * it back into a long (`conv`), and copies a k-slot accumulator ARRAY
  * per shingle inside the fold (Spark's `aggregate` rebuilds the
  * accumulator every lambda application — k array writes + an array
  * alloc per element). Here: one thread-local MessageDigest, the first
  * 4 digest bytes folded big-endian into the unsigned 32-bit base hash
  * (exactly what `conv(substring(md5,1,8),16,10)` parses), and k
  * running minima in a primitive long[] touched in place.
  *
  * Arithmetic bounds are [[TextOps]]' (A < 2^30, h < 2^32 ⇒
  * A·h + B < 2^63 — no wrap); an empty or all-null array yields all
  * Long.MaxValue slots, matching the fold's seed. Mirrors the
  * reference's per-document signature loop (minhash.py-style recipes);
  * the affine-permutation constants are [[TextOps.minhashA]]/`B`.
  *
  * Measured honestly: on the 10× local corpus the composed-dedup
  * timings did NOT move — there the stage is dominated by
  * deserializing the persisted shingle frame, not by the minima
  * arithmetic. The expression still removes two transient allocations
  * per shingle (hex string + accumulator array copy), which is what
  * matters when the signature pass runs over cold 100 TB scans where
  * CPU per shingle, not cache IO, is the budget.
  */
object MinhashSigHelper {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val A = Array.tabulate(TextOps.MinhashMaxK)(TextOps.minhashA)
  private val B = Array.tabulate(TextOps.MinhashMaxK)(TextOps.minhashB)
  private val P = TextOps.MinhashP

  def compute(arr: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val d = md.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        d.reset()
        val h = d.digest(s.getBytes)
        val hv = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
          ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
        var p = 0
        while (p < k) {
          val v = (A(p) * hv + B(p)) % P
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

case class MinhashSig(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0 && k <= TextOps.MinhashMaxK,
    s"minhash k=$k out of range 1..${TextOps.MinhashMaxK}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires ARRAY<STRING> input, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    MinhashSigHelper.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MinhashSigHelper.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}
