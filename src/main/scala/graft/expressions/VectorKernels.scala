package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd vector kernels — the hot inner loops of the
  * embedding family (SRP-LSH banding, cosine verification, IVF/PQ
  * assignment, k-means) previously ran as interpreted higher-order
  * expressions (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`): Spark
  * does not compile lambda-bearing HOFs, so every candidate pair paid
  * per-element interpreter dispatch + boxing. These expressions emit
  * a tight primitive loop over `ArrayData.getDouble` instead, keeping
  * the whole verify stage inside whole-stage codegen.
  *
  * SEMANTICS, for ARRAY<DOUBLE> inputs, ARE BIT-FOR-BIT THE HOF
  * FORM'S — this matters twice: every DuckDB oracle replays the same
  * left-assoc sequential fold, and [[graft.functions.VectorOps]]'s
  * scaladoc promises deterministic element-order summation.
  * Concretely:
  *   - accumulate in ELEMENT ORDER: acc = ((0+t₀)+t₁)+… (no pairwise
  *     / vectorized reassociation),
  *   - NULL array → NULL (nullIntolerant),
  *   - mismatched lengths → NULL (zip_with pads with NULL, the old
  *     fold nulled out),
  *   - any NULL element → NULL (same propagation).
  *
  * FLOAT inputs widen per element (x.toDouble) BEFORE multiplying /
  * subtracting — i.e. the contract is `VectorOps.asDouble`-then-fold,
  * NOT the raw float-precision HOF (`zip_with(a, b, _*_)` over floats
  * multiplied in FLOAT before the double fold; the two differ on
  * values that are not exact binary fractions). The widened contract
  * is the one the oracles and recall specs pin (VectorKernelSpec has
  * a non-exact-fraction float parity row). Integer-element arrays are
  * REJECTED at type-check (the HOF form coerced them); cast with
  * `VectorOps.asDouble` first.
  */
object VectorKernelHelper {
  /** dot = Σ a_i·b_i, sequential; null on length mismatch/null elem. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Σ (a_i−b_i)², sequential; same null contract as [[dot]]. */
  def sqDist(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }
}

abstract class VectorKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType | FloatType, _),
            ArrayType(DoubleType | FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<DOUBLE|FLOAT> inputs, " +
          s"got ${l.sql} and ${r.sql}")
    }

  protected def helperMethod: String

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val m = if (helperMethod == "dot") VectorKernelHelper.dot _
      else VectorKernelHelper.sqDist _
    m(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemIsFloat(left), elemIsFloat(right))
  }

  // The helper returns a boxed Double whose null encodes the
  // mismatched-length / null-element cases — unwrap it into the
  // primitive slot + isNull flag so downstream codegen stays unboxed.
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxed")
      s"""
       |java.lang.Double $boxed =
       |  graft.expressions.VectorKernelHelper.$helperMethod(
       |    $a, $b, ${elemIsFloat(left)}, ${elemIsFloat(right)});
       |if ($boxed == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
}

/** Sequential-fold dot product — `VectorOps.dot`'s engine. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorKernel {
  override def prettyName: String = "vec_dot"
  override protected def helperMethod: String = "dot"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Sequential-fold squared Euclidean distance — the IVF/PQ/k-means
  * assignment kernel (`norm2(zip_with(a, b, _-_))` fused into one
  * pass, no intermediate difference array). */
case class SquaredDistance(left: Expression, right: Expression)
    extends VectorKernel {
  override def prettyName: String = "vec_sqdist"
  override protected def helperMethod: String = "sqDist"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}
