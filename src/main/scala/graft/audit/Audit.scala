package graft.audit

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Validation/audit operators (SURVEY.md §2.11 V1–V9) — the reference's
  * acceptance gate (sql/validations/audit_stg.sql, health_check.ps1),
  * expressed as DataFrames that must come back empty/zero after a
  * pipeline run. Tests assert exactly that (§5.2
  * audit-suite-as-assertions).
  */
object Audit {

  /** V1: per-run record/file counts. */
  def runCounts(silver: DataFrame): DataFrame =
    silver.groupBy("run_id")
      .agg(count(lit(1)).as("n_records"),
        countDistinct("source_blob_path").as("n_files"),
        min("loaded_at").as("first_loaded"),
        max("loaded_at").as("last_loaded"))

  /** V1b: windowed load-history rollup (audit_stg.sql:180-198) — per-day
    * record counts over the trailing `days`, one labeled frame per
    * silver table, union-stitched by the caller. `asOf` is injected so
    * the report is deterministic/testable (the reference pins
    * CURRENT_DATE). */
  def loadHistory(silver: DataFrame, sourceLabel: String, days: Int = 7,
      asOf: Column = current_date()): DataFrame =
    silver
      .filter(col("loaded_at") >= date_sub(asOf, days))
      .groupBy(col("loaded_at").cast("date").as("load_date"))
      .agg(count(lit(1)).as("records_loaded"))
      .select(col("load_date"), lit(sourceLabel).as("source"),
        col("records_loaded"))

  /** V2: duplicate scan on a key set — violations have n > 1. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** V3: id-uniqueness delta (COUNT(*) - COUNT(DISTINCT id)). */
  def uniquenessDelta(df: DataFrame, idCol: String): DataFrame =
    df.agg((count(lit(1)) - countDistinct(idCol)).as("dup_delta"))

  /** V4: mandatory-field null violations. */
  def nullViolations(df: DataFrame, mandatory: Seq[String]): DataFrame =
    mandatory.map(c =>
      df.filter(col(c).isNull)
        .agg(count(lit(1)).as("n_null")).select(lit(c).as("column"),
          col("n_null")))
      .reduce(_ unionByName _)
      .filter(col("n_null") > 0)

  /** V5: date-sanity anomalies (created after updated). */
  def dateAnomalies(df: DataFrame, created: String,
      updated: String): DataFrame =
    df.filter(col(created) > col(updated))

  /** V6: layer-count reconciliation (STG vs CORE), as a one-row frame
    * with the delta; 0 means reconciled. */
  def layerReconciliation(stg: DataFrame, core: DataFrame): DataFrame = {
    val a = stg.agg(count(lit(1)).as("stg_n"))
    val b = core.agg(count(lit(1)).as("core_n"))
    a.crossJoin(b).select(col("stg_n"), col("core_n"),
      (col("stg_n") - col("core_n")).as("delta"))
  }

  /** V7: freshness ordering — core must not be fresher than silver. */
  def freshnessViolation(stg: DataFrame, core: DataFrame,
      stgTs: String = "_updated_at",
      coreTs: String = "_updated_at"): DataFrame = {
    val a = stg.agg(max(stgTs).as("stg_max"))
    val b = core.agg(max(coreTs).as("core_max"))
    a.crossJoin(b).filter(col("core_max") > col("stg_max"))
  }

  /** V8: business distribution sanity (per-dimension counts). */
  def distribution(df: DataFrame, dims: Seq[String]): DataFrame =
    df.groupBy(dims.map(col): _*).agg(count(lit(1)).as("n"))

  /** V9: extraction gap analysis — calendar days missing between the
    * min and max of a date column. */
  def missingDays(df: DataFrame, dateCol: Column): DataFrame = {
    val days = df.agg(min(dateCol.cast("date")).as("lo"),
      max(dateCol.cast("date")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as("d"))
    val present = df.select(dateCol.cast("date").as("d")).distinct()
    days.join(present, Seq("d"), "left_anti")
  }
}
