package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Row-local nearest-neighbor assignment kernels for the ANN family —
  * the r12-optimization replacement for the crossJoin-then-argmin
  * plan shape ([[graft.operators.Ann.ivfAssignCells]] / `pqAssign`).
  *
  * The old shape was already shuffle-narrow (map-side-combined
  * `min(struct(d2, id))`), but it still paid, per corpus row and per
  * Lloyd iteration: the n × ncents row expansion through a
  * HashAggregate, one Exchange of (id, cell, d2) for the argmin, and
  * one more Exchange to join the vector column back. The centroid /
  * codebook tables are SMALL BY CONTRACT (they are driver-collected
  * and broadcast in every existing call site), so the argmin is a
  * pure row-local function of the vector — these expressions embed
  * the table in the plan (a reference object, shipped once per task
  * like any broadcast) and emit a tight primitive loop, leaving ZERO
  * exchanges in an assignment pass (guide §2.4/§8: decide placement
  * with a lightweight broadcast table, never shuffle the payload).
  *
  * SEMANTICS ARE BIT-FOR-BIT THE JOIN FORM'S (the property every
  * DuckDB oracle gate replays):
  *   - distance = [[VectorKernelHelper.sqDist]]'s sequential
  *     element-order fold, FLOAT elements widened per element;
  *   - argmin = `min(struct(d2, id))`: strictly-smaller d2 wins, ties
  *     keep the smallest id (tables are sorted by id at construction);
  *   - early abandonment is safe: partial sums of squares are
  *     non-decreasing, so a candidate whose partial already reaches
  *     the incumbent's d2 can only tie (discarded — incumbent has the
  *     smaller id) or lose; the winner always runs its full fold, so
  *     the reported d2 is the exact full sum;
  *   - NULL vector → NULL (nullIntolerant); a vector whose length
  *     does not match the table's dimension → NULL (the join form
  *     nulled every candidate distance).
  */
object AnnKernelHelper {

  /** Argmin cell over a flat row-major centroid table.
    * @return GenericInternalRow(cell: Long, d2: Double), or null when
    *         the vector length mismatches `dim` or an element is null. */
  def nearestCell(vec: ArrayData, isFloat: Boolean, ids: Array[Long],
      flat: Array[Double], dim: Int): GenericInternalRow = {
    val n = vec.numElements()
    if (n != dim) return null
    // copy once: ArrayData.getDouble is a virtual call per access and
    // the loop reads each element ncents times
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val ncents = ids.length
    var bestD2 = Double.PositiveInfinity
    var bestId = 0L
    var any = false
    var c = 0
    while (c < ncents) {
      val base = c * dim
      var acc = 0.0
      var j = 0
      // early abandonment: partials are non-decreasing, so acc >=
      // bestD2 can never produce a strict win (and ties lose to the
      // earlier id)
      while (j < dim && acc < bestD2) {
        val d = v(j) - flat(base + j)
        acc += d * d
        j += 1
      }
      if (j == dim && (acc < bestD2 || !any)) {
        bestD2 = acc
        bestId = ids(c)
        any = true
      }
      c += 1
    }
    if (!any) return null
    new GenericInternalRow(Array[Any](bestId, bestD2))
  }

  /** PQ codes: per subspace s (slice [s·dsub, (s+1)·dsub)), the code
    * of the nearest codeword in that subspace's book. `flat` is
    * row-major (sub, code, dim): flat[(s·ksub + c)·dsub + j].
    * @return int[] of m codes, or null when the vector length is not
    *         m·dsub or an element is null. */
  def pqCodes(vec: ArrayData, isFloat: Boolean, codes: Array[Int],
      flat: Array[Double], m: Int, ksub: Int,
      dsub: Int): GenericArrayData = {
    val n = vec.numElements()
    if (n != m * dsub) return null
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val voff = s * dsub
      var bestD2 = Double.PositiveInfinity
      var bestCode = 0
      var any = false
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * dsub
        var acc = 0.0
        var j = 0
        while (j < dsub && acc < bestD2) {
          val d = v(voff + j) - flat(base + j)
          acc += d * d
          j += 1
        }
        if (j == dsub && (acc < bestD2 || !any)) {
          bestD2 = acc
          bestCode = codes(s * ksub + c)
          any = true
        }
        c += 1
      }
      out(s) = bestCode
      s += 1
    }
    new GenericArrayData(out)
  }
}

abstract class AnnKernel extends UnaryExpression {
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  protected def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType | FloatType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<DOUBLE|FLOAT> input, got ${other.sql}")
    }
}

/** `nearest_cell(vec)` against a plan-embedded centroid table:
  * STRUCT<cell: BIGINT, d2: DOUBLE> of the argmin centroid under the
  * (d2 asc, id asc) total order. `ids`/`cents` must be parallel and
  * sorted ascending by id (the [[graft.operators.Ann]] builders
  * guarantee it); all centroids share one dimension. */
case class NearestCell(child: Expression, ids: IndexedSeq[Long],
    cents: IndexedSeq[IndexedSeq[Double]]) extends AnnKernel {

  require(ids.nonEmpty && ids.length == cents.length,
    "nearest_cell needs a non-empty centroid table")
  require(cents.forall(_.length == cents.head.length),
    "nearest_cell centroids must share one dimension")

  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val flatArr: Array[Double] = {
    val dim = cents.head.length
    val a = new Array[Double](cents.length * dim)
    var c = 0
    while (c < cents.length) {
      var j = 0
      while (j < dim) { a(c * dim + j) = cents(c)(j); j += 1 }
      c += 1
    }
    a
  }
  private def dim: Int = cents.head.length

  override def dataType: DataType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("d2", DoubleType, nullable = false)))
  override def prettyName: String = "nearest_cell"

  override protected def nullSafeEval(input: Any): Any =
    AnnKernelHelper.nearestCell(input.asInstanceOf[ArrayData],
      elemIsFloat, idArr, flatArr, dim)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ids", idArr, "long[]")
    val flatRef = ctx.addReferenceObj("flat", flatArr, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val row = ctx.freshName("row")
      s"""
       |InternalRow $row = graft.expressions.AnnKernelHelper.nearestCell(
       |  $c, $elemIsFloat, $idsRef, $flatRef, $dim);
       |if ($row == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = $row; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCell = copy(child = newChild)
}

/** `pq_codes(vec)` against a plan-embedded codebook table:
  * ARRAY<INT> of length m — element s is the code of the nearest
  * codeword for subspace s's slice, ties to the smallest code.
  * `books(s)` must be sorted ascending by code; every codeword is
  * `dsub` wide. */
case class PqCodes(child: Expression,
    books: IndexedSeq[IndexedSeq[(Int, IndexedSeq[Double])]])
    extends AnnKernel {

  require(books.nonEmpty && books.forall(_.nonEmpty),
    "pq_codes needs a non-empty codebook per subspace")
  require(books.forall(_.length == books.head.length),
    "pq_codes subspace books must share one ksub")
  require(books.forall(_.forall(_._2.length == books.head.head._2.length)),
    "pq_codes codewords must share one dsub")

  private def m: Int = books.length
  private def ksub: Int = books.head.length
  private def dsub: Int = books.head.head._2.length

  @transient private lazy val codeArr: Array[Int] = {
    val a = new Array[Int](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) { a(s * ksub + c) = books(s)(c)._1; c += 1 }
      s += 1
    }
    a
  }
  @transient private lazy val flatArr: Array[Double] = {
    val a = new Array[Double](m * ksub * dsub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        val cv = books(s)(c)._2
        var j = 0
        while (j < dsub) { a((s * ksub + c) * dsub + j) = cv(j); j += 1 }
        c += 1
      }
      s += 1
    }
    a
  }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override protected def nullSafeEval(input: Any): Any =
    AnnKernelHelper.pqCodes(input.asInstanceOf[ArrayData], elemIsFloat,
      codeArr, flatArr, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val codesRef = ctx.addReferenceObj("codes", codeArr, "int[]")
    val flatRef = ctx.addReferenceObj("flat", flatArr, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("arr")
      s"""
       |org.apache.spark.sql.catalyst.util.GenericArrayData $arr =
       |  graft.expressions.AnnKernelHelper.pqCodes(
       |    $c, $elemIsFloat, $codesRef, $flatRef, $m, $ksub, $dsub);
       |if ($arr == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = $arr; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqCodes = copy(child = newChild)
}
