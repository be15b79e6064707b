package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** JSON-shape operators for the silver→gold projections (SURVEY.md §2
  * P3–P6, P8, P10).
  */
object JsonOps {

  /** from_json with a DDL type string (struct, array, or map). */
  def parse(c: Column, ddl: String): Column =
    from_json(c, org.apache.spark.sql.types.DataType.fromDDL(ddl))

  /** First element or NULL (0-based; tolerant of empty arrays). */
  def first(arr: Column): Column = get(arr, lit(0))

  /** First element of `arr` whose `typeField` is in `ids`, then project
    * `valueField` — the reference's correlated LIMIT-1 subquery for
    * member email/cellphone (normalize_evo_members_v2.py:142-145).
    * Null-safe: missing/empty/non-array → NULL. */
  def firstMatch(arr: Column, typeField: String, ids: Seq[Int],
      valueField: String): Column =
    get(filter(coalesce(arr, array()),
      e => e.getField(typeField).cast("long")
        .isin(ids.map(i => i.toLong: Any): _*)), lit(0))
      .getField(valueField)

  /** Primary-else-first selection over [{value, primary}] arrays —
    * Pipedrive email/phone (normalize_pipedrive.py:554-577). */
  def primaryValue(arr: Column): Column = {
    val a = coalesce(arr, array())
    coalesce(
      get(filter(a, e => e.getField("primary") === true), lit(0))
        .getField("value"),
      get(a, lit(0)).getField("value"))
  }

  /** Residual map: all JSON keys NOT in `standard` — the reference's
    * custom_fields dict-comprehension (normalize_pipedrive.py:707-739).
    * Input is the raw JSON text column (kept in silver precisely so no
    * field is ever lost); output is compact JSON text or NULL when
    * nothing remains. Native expression so nested values stay real
    * JSON (a map<string,string> round-trip would escape them into
    * strings and break $.field.sub path access downstream). */
  def residualJson(rawJson: Column, standard: Seq[String]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.JsonResidual(
        org.apache.spark.sql.GraftColumnBridge.expression(rawJson),
        standard))

  /** Array guard: value if it is an array, else empty array — the
    * jsonb_typeof(...)='array' CASE (normalize_evo_members.py:281-288).
    * With from_json, shape mismatch already yields NULL. */
  def arrayOrEmpty(arr: Column): Column = coalesce(arr, array())

  /** Conditional JSON construction (P8): build {fields...} only when
    * `cond` holds, else NULL. */
  def jsonWhen(cond: Column, fields: (String, Column)*): Column =
    when(cond, to_json(struct(fields.map { case (n, c) => c.as(n) }: _*)))
      .otherwise(lit(null).cast("string"))
}
