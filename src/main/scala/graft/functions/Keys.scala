package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic surrogate keys (SURVEY.md §2 K6, ADR-004).
  *
  * Mirrors the reference's entry-id recipe bit-for-bit
  * (load_evo_entries_stg_fast_v2.py:210-223):
  *   key = "|".join(str(field) or "" for 7 fields)
  *   id  = int(md5(key)[:15], 16) % 10**15
  *
  * 15 hex digits = 60 bits, so the conv() result fits a signed long with
  * headroom; spec asserts exact equality against Python-computed
  * constants (KeysSpec).
  */
object Keys {

  /** Pipe-joined key with nulls as empty string. concat_ws alone would
    * *skip* nulls ("a|b" instead of "a||b"), silently changing every
    * hash — hence the explicit per-field coalesce. */
  def pipeKey(fields: Column*): Column =
    concat_ws("|", fields.map(f => coalesce(f.cast("string"), lit(""))): _*)

  /** Python-falsy normalization for NUMERIC key fields: the reference
    * builds keys with `str(rec.get(f) or "")`, so 0 (and false) map to
    * "" exactly like None — required for bit-exact id parity on
    * zero-valued ids. String fields keep "0" (truthy in Python). */
  def pyFalsyNum(c: Column): Column = {
    val s = c.cast("string")
    when(s.isNull || s === "" || s === "0" || s === "false", lit(null))
      .otherwise(s)
  }

  /** int(md5(key)[:15], 16) % 10^15 as LongType — built-in composition
    * (md5+conv+pmod); kept as the cross-checkable baseline for the
    * native expression. */
  def md5Key15(key: Column): Column =
    pmod(conv(substring(md5(key), 1, 15), 16, 10).cast("long"),
      lit(1000000000000000L))

  /** The EVO entries surrogate id over its 7 natural-key fields (uses
    * the native expression — ~20% faster on the 110M-row path, proven
    * bit-equal to the composed form in ExpressionAndPropertySpec).
    * Numeric id fields go through pyFalsyNum: the reference's
    * `str(rec.get(f) or "")` maps 0 to "", and parity must hold for
    * zero-valued ids too. */
  def entryId(date: Column, idMember: Column, idProspect: Column,
      idEmployee: Column, idBranch: Column, device: Column,
      entryAction: Column): Column =
    md5Key15Native(pipeKey(date,
      pyFalsyNum(idMember), pyFalsyNum(idProspect), pyFalsyNum(idEmployee),
      pyFalsyNum(idBranch), device, entryAction))

  /** Native-Expression variant (graft.expressions.Md5Key15): same
    * bit-exact result as md5Key15, digesting straight to long without
    * the 32-char hex round-trip — for the 110M-row hot path. */
  def md5Key15Native(key: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.Md5Key15(
        org.apache.spark.sql.GraftColumnBridge.expression(key)))

  /** Register md5_key15 for SQL texts: spark.sql("md5_key15(k)"). */
  def registerSqlFunctions(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_key15",
      exprs => graft.expressions.Md5Key15(exprs.head), "scala_udf")
}
