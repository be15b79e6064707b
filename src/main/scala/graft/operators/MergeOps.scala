package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed-upsert semantics over plain Parquet tables (SURVEY.md §2
  * K3/K4/K7–K10).
  *
  * The reference upserts with `ON CONFLICT (key) DO UPDATE`; with Delta
  * this would be `MERGE INTO`. This environment ships vanilla Spark, so
  * MERGE is emulated as: read target ∪ source → keep-latest per key →
  * atomic overwrite (write tmp, swap). The *semantics* are what parity
  * requires: idempotent, last-write-wins per business key, `_loaded_at`
  * preserved on update while `_updated_at` advances (SURVEY.md §7.3
  * hard-point 3).
  *
  * Scale notes: overwrite-merge rewrites the table — on a real lake use
  * Delta/Iceberg MERGE (row-group pruning, no full rewrite) or the
  * partitioned variant `replacePartitions` below which only rewrites
  * touched partitions (the reference's year-partition TRUNCATE+INSERT,
  * K10).
  */
object MergeOps {

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path)
    f.exists(p)
  }

  def readIfExists(spark: SparkSession, path: String): Option[DataFrame] =
    if (exists(spark, path)) Some(spark.read.parquet(path)) else None

  /** Atomic-ish overwrite: write to `<path>__tmp`, then swap. Plain
    * mode("overwrite") deletes the target before reading finishes when
    * target feeds source — the tmp swap also guards partial writes.
    * `partitionCols` preserves a hive partition layout across the
    * rewrite (mixing partitioned and flat files under one table root
    * makes later reads fail with conflicting directory structures). */
  private[operators] def overwrite(spark: SparkSession, df: DataFrame,
      path: String, partitionCols: Seq[String] = Nil): Unit = {
    val tmp = path + "__tmp"
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp)
    val (f, target) = fs(spark, path)
    val (_, tmpP) = fs(spark, tmp)
    if (f.exists(target)) f.delete(target, true)
    f.rename(tmpP, target)
  }

  /** Upsert `source` into the parquet table at `path`, keyed on `keys`,
    * latest-by `versionCol` (must be totally ordered per key — callers
    * append a tie-break column when needed).
    *
    * `preserveOnUpdate`: columns whose existing-target value survives an
    * update (the reference keeps `_loaded_at`, only `_updated_at` moves).
    */
  def upsert(spark: SparkSession, source: DataFrame, path: String,
      keys: Seq[String], versionCol: String,
      preserveOnUpdate: Seq[String] = Nil,
      partitionCols: Seq[String] = Nil): Unit = {
    readIfExists(spark, path) match {
      case None =>
        // within-batch dedup also on first load: ON CONFLICT processes a
        // batch row-by-row, so duplicate keys in one batch still collapse
        overwrite(spark,
          Dedup.keepLatest(source, keys, Seq(col(versionCol))), path,
          partitionCols)
      case Some(target) =>
        // Schema evolution, two-sided and wedge-free (case-insensitive
        // name matching like Spark's resolver):
        //  - source-only columns widen the table (NULL for old rows) —
        //    silently dropping them would lose data on every merge;
        //  - target-only columns are auto-preserved: updated rows keep
        //    their existing value (a transient extra column in one batch
        //    must not null-out history or wedge later normal batches).
        val srcNames = source.columns.map(_.toLowerCase).toSet
        val missing = target.columns.toSeq
          .filterNot(c => srcNames.contains(c.toLowerCase))
        val merged = Dedup.keepLatest(
          source.withColumn("__is_new", lit(1))
            .unionByName(target.withColumn("__is_new", lit(0)),
              allowMissingColumns = true),
          keys, Seq(col(versionCol), col("__is_new")))
        val preserve = (preserveOnUpdate ++ missing).distinct
        val restored =
          if (preserve.isEmpty) merged.drop("__is_new")
          else {
            // keep target's value for preserved columns when the key existed
            val old = target.select(
              (keys.map(col) ++ preserve.map(c =>
                col(c).as(s"__old_$c"))): _*)
            preserve.foldLeft(
              merged.drop("__is_new").join(old, keys, "left")) { (acc, c) =>
                acc.withColumn(c, coalesce(col(s"__old_$c"), col(c)))
                  .drop(s"__old_$c")
              }
          }
        overwrite(spark, restored, path, partitionCols)
    }
  }

  /** Insert-ignore (K8): only keys absent from the target are added —
    * the ON CONFLICT DO NOTHING bridge-table pattern. */
  def insertIgnore(spark: SparkSession, source: DataFrame, path: String,
      keys: Seq[String]): Unit = {
    readIfExists(spark, path) match {
      case None => overwrite(spark, source.dropDuplicates(keys), path)
      case Some(target) =>
        val cols = target.columns.toSeq
        val novel = source.select(cols.map(col): _*)
          .dropDuplicates(keys)
          .join(target.select(keys.map(col): _*).distinct(), keys, "left_anti")
        overwrite(spark, target.unionByName(novel), path)
    }
  }

  /** Full refresh (K9): TRUNCATE+INSERT equivalent. */
  def fullRefresh(spark: SparkSession, source: DataFrame, path: String): Unit =
    overwrite(spark, source, path)

  /** Partition replace (K10): rewrite only the partitions present in
    * `source` — dynamic partition overwrite, the reference's per-year
    * TRUNCATE PARTITION + INSERT. */
  def replacePartitions(spark: SparkSession, source: DataFrame, path: String,
      partitionCol: String): Unit = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    source.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)
  }
}
