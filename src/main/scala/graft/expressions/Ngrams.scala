package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native positional n-gram spans — `TextOps.ngramsRaw`'s engine.
  *
  * The composed form (n parallel `slice`s reduced pairwise with
  * `zip_with(concat(x, " ", y))` — chosen over a `transform` lambda
  * for the O(tokens²) CollapseProject trap documented on ngramsRaw)
  * allocates n slice copies plus n−1 intermediate gram arrays per
  * row and pays interpreted-lambda dispatch per element per zip. This
  * expression emits ONE loop building each gram with a single
  * `UTF8String.concat` — same output, no transient arrays, fully
  * inside whole-stage codegen. It feeds every shingle consumer
  * (MinHash banding, containment gram index, repetition signals,
  * n-gram decontam spans), where the construction pass runs over the
  * raw corpus — the 100-TB-scan side of those pipelines.
  *
  * Contract is bit-for-bit the composed form's:
  *   - < n tokens (or NULL input: size(NULL) is NULL, so the old
  *     `when` fell through) → EMPTY array, never NULL — the
  *     expression itself is non-nullable,
  *   - a NULL token NULLs exactly the grams that span it
  *     (UTF8String.concat propagates null like `concat`),
  *   - gram text = tokens joined with a single space — includes
  *     empty-string tokens exactly as zip_with concat did.
  */
object NgramsHelper {
  private val Empty = new GenericArrayData(Array.empty[Any])

  def compute(arr: ArrayData, n: Int, sep: UTF8String): ArrayData = {
    if (arr == null) return Empty
    val sz = arr.numElements()
    val m = sz - (n - 1)
    if (m < 1) return Empty
    val out = new Array[Any](m)
    val parts = new Array[UTF8String](2 * n - 1)
    var j = 1
    while (j < parts.length) { parts(j) = sep; j += 2 }
    var i = 0
    while (i < m) {
      var k = 0
      while (k < n) {
        parts(2 * k) =
          if (arr.isNullAt(i + k)) null else arr.getUTF8String(i + k)
        k += 1
      }
      out(i) = UTF8String.concat(parts: _*) // null if any part null
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class Ngrams(child: Expression, n: Int, sep: String = " ")
    extends UnaryExpression {

  require(n >= 1, s"ngram width must be >= 1, got $n")
  require(sep != null, "sep must not be null")

  // one shared UTF8String per expression instance, referenced from
  // generated code via a CodegenContext object reference
  @transient private lazy val sepUtf8 = UTF8String.fromString(sep)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ngrams requires ARRAY<STRING> input, got ${other.sql}")
    }

  // NULL input maps to the empty array (see contract above), so this
  // cannot use the nullIntolerant nullSafeEval path.
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    NgramsHelper.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], n, sepUtf8)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    val sepRef = ctx.addReferenceObj("ngramSep", sepUtf8,
      classOf[UTF8String].getName)
    ev.copy(
      code = c.code +
        code"""
          |$javaType ${ev.value} = graft.expressions.NgramsHelper.compute(
          |  ${c.isNull} ? null : ${c.value}, $n, $sepRef);
          |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Ngrams =
    copy(child = newChild)
}
