package graft.silver

import graft.functions.SafeCasts
import graft.operators.MergeOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Silver layer: raw records + lineage, idempotently upserted
  * (SURVEY.md §2 K3–K6, D2/D3).
  *
  * Two writer modes mirror the reference's two staging designs
  * (§7.3 hard-point 6):
  *   - versioned (Pipedrive/Zendesk): every (blob, line) version kept,
  *     keyed on lineage — the audit trail; latest is picked at gold
  *     time (D1);
  *   - replacing (EVO): keyed on the natural id — staging holds exactly
  *     one latest row per entity (D2).
  *
  * All loads are at-least-once tolerant: re-running the same bronze run
  * is a no-op (upsert on the same keys), the invariant every reference
  * validation protects (OPERATIONS_GUIDE.md:59-95).
  */
object SilverLoader {

  /** Lineage columns attached at load (FIXTURES.md §A.7). `loadedAt` is
    * injectable so tests and replays are deterministic. */
  private def withLineage(bronze: DataFrame, runId: String,
      loadedAt: java.sql.Timestamp): DataFrame =
    bronze
      .withColumnRenamed("raw_line", "raw_data")
      .withColumn("loaded_at", lit(loadedAt))
      .withColumn("run_id", coalesce(col("run_id").cast("string"), lit(runId)))

  /** Versioned mode (PD/ZD): key = (scope?, source_blob_path,
    * source_line_no). Keeps every blob version; replays of the same
    * blob replace in place. */
  def loadVersioned(spark: SparkSession, bronze: DataFrame, path: String,
      runId: String, loadedAt: java.sql.Timestamp,
      scoped: Boolean = true): Unit = {
    val keys = (if (scoped) Seq("scope") else Nil) ++
      Seq("source_blob_path", "source_line_no")
    val src = withLineage(bronze, runId, loadedAt)
    MergeOps.upsert(spark, src, path, keys, "loaded_at")
  }

  /** Replacing mode (EVO): key = natural id extracted from the payload;
    * null-key records dropped (K5); optional surrogate key column
    * (entries, K6) supplied by the caller.
    *
    * `_loaded_at` is preserved across updates while the payload and
    * `_updated_at` advance — the reference's audit-column contract (K7).
    */
  def loadReplacing(spark: SparkSession, bronze: DataFrame, path: String,
      naturalKey: Map[String, Column], runId: String,
      loadedAt: java.sql.Timestamp): Unit = {
    val withKeys = naturalKey.foldLeft(
      withLineage(bronze, runId, loadedAt)) { case (df, (name, expr)) =>
        df.withColumn(name, expr)
      }
    val nonNull = naturalKey.keys.foldLeft(withKeys) { (df, k) =>
      df.filter(col(k).isNotNull)
    }
    val src = nonNull
      .withColumn("_loaded_at", col("loaded_at"))
      .withColumn("_updated_at", col("loaded_at"))
      .drop("loaded_at")
    MergeOps.upsert(spark, src, path, naturalKey.keys.toSeq, "_updated_at",
      preserveOnUpdate = Seq("_loaded_at"))
  }

  /** Standard natural-key extractor: JSON field as BIGINT. */
  def jsonLongKey(field: String): Column =
    SafeCasts.safeLong(get_json_object(col("raw_data"), s"$$.$field"))
}
