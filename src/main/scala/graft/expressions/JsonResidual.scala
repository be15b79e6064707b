package graft.expressions

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Residual custom-fields map (SURVEY.md §2 P6) as a native expression:
  * all top-level JSON keys NOT in `standard`, with nested values kept
  * as real JSON (the reference's dict comprehension keeps objects as
  * objects; a map<string,string> round-trip would re-serialize them as
  * escaped strings and break downstream path access).
  *
  * CodegenFallback: this runs once per gold row off the hot path;
  * Jackson (bundled with Spark) does the tree work. Key order follows
  * input order — deterministic. Empty residual and non-object input
  * yield NULL, matching the composed variant's contract.
  */
case class JsonResidual(child: Expression, standard: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "json_residual"

  @transient private lazy val mapper = new ObjectMapper()
  @transient private lazy val standardSet = standard.toSet

  override protected def nullSafeEval(input: Any): Any = {
    val node =
      try mapper.readTree(input.toString)
      catch { case _: Exception => null }
    if (node == null || !node.isObject) null
    else {
      val out = mapper.createObjectNode()
      val it = node.fields()
      while (it.hasNext) {
        val e = it.next()
        if (!standardSet.contains(e.getKey)) out.set(e.getKey, e.getValue)
      }
      if (out.size() == 0) null
      else UTF8String.fromString(mapper.writeValueAsString(out))
    }
  }

  override protected def withNewChildInternal(newChild: Expression)
      : JsonResidual = copy(child = newChild)
}
