package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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
  * Scale notes: for FLAT tables overwrite-merge rewrites the table — on
  * a real lake use Delta/Iceberg MERGE. For PARTITIONED tables
  * (`partitionCols` non-empty) the merge is partition-pruned: only the
  * partitions present in the source delta are read, merged, and
  * swapped; untouched partition directories are never opened or
  * rewritten. That is the 100-TB daily-delta story: a 10M-row day of
  * entries merges against one `entry_year`, not the 110M-row history
  * (reference evo_schemas.sql:417-462 partitions `entries` by year for
  * exactly this reason).
  *
  * Crash safety: every swap goes target→`__bak`, tmp→target, drop bak —
  * a crash between the renames leaves `__bak` holding the full pre-swap
  * table, and the next read/write through this object restores it
  * (`recoverIfHeadless`). Rename results are checked; a failed rename
  * throws instead of silently dropping the table.
  */
object MergeOps {

  private def fs(spark: SparkSession, path: String) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def mv(f: FileSystem, from: Path, to: Path): Unit =
    if (!f.rename(from, to))
      throw new java.io.IOException(s"rename $from -> $to failed")

  /** A crash between the two swap renames leaves the table headless:
    * target missing, `__bak` holding the pre-swap copy. Restore it
    * before answering any existence/read question, so history is never
    * silently rebuilt from a single batch. */
  private def recoverIfHeadless(f: FileSystem, target: Path): Unit = {
    val bak = new Path(target.toString + "__bak")
    if (!f.exists(target) && f.exists(bak)) mv(f, bak, target)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path)
    recoverIfHeadless(f, p)
    f.exists(p)
  }

  def readIfExists(spark: SparkSession, path: String): Option[DataFrame] =
    if (exists(spark, path)) Some(spark.read.parquet(path)) else None

  /** Atomic-ish overwrite: write to `<path>__tmp`, then swap via
    * `__bak` (see crash-safety note on the object). Plain
    * mode("overwrite") deletes the target before reading finishes when
    * target feeds source — the tmp swap also guards partial writes.
    * `partitionCols` preserves a hive partition layout across the
    * rewrite (mixing partitioned and flat files under one table root
    * makes later reads fail with conflicting directory structures). */
  private[operators] def overwrite(spark: SparkSession, df: DataFrame,
      path: String, partitionCols: Seq[String] = Nil): Unit = {
    val (f, target) = fs(spark, path)
    recoverIfHeadless(f, target)
    val tmp = new Path(path + "__tmp")
    val bak = new Path(path + "__bak")
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    // a bak here is stale (the swap it belonged to completed — otherwise
    // recoverIfHeadless would have renamed it back to target above)
    if (f.exists(bak)) f.delete(bak, true)
    if (f.exists(target)) mv(f, target, bak)
    mv(f, tmp, target)
    f.delete(bak, true)
    // the session FileStatusCache may still hold the pre-swap listing
    // for this path; a later read would chase deleted part files
    spark.catalog.refreshByPath(path)
  }

  /** target ∪ source → keep-latest per key, preserving `preserve`
    * columns' target values on update and auto-preserving target-only
    * columns (schema evolution, two-sided and wedge-free).
    * Package-visible: the MERGE semantics are storage-independent, so
    * every [[TableFormat]] implementation shares THIS definition —
    * two formats can't drift apart on what an upsert means. */
  private[operators] def merge(target: DataFrame, source: DataFrame,
      keys: Seq[String], versionCol: String,
      preserveOnUpdate: Seq[String]): DataFrame = {
    // Schema evolution (case-insensitive name matching like Spark's
    // resolver): source-only columns widen the table (NULL for old
    // rows); target-only columns are auto-preserved so a transient
    // narrow batch can't null-out history.
    val srcNames = source.columns.map(_.toLowerCase).toSet
    val missing = target.columns.toSeq
      .filterNot(c => srcNames.contains(c.toLowerCase))
    val merged = Dedup.keepLatest(
      source.withColumn("__is_new", lit(1))
        .unionByName(target.withColumn("__is_new", lit(0)),
          allowMissingColumns = true),
      keys, Seq(col(versionCol), col("__is_new")))
    val preserve = (preserveOnUpdate ++ missing).distinct
    if (preserve.isEmpty) merged.drop("__is_new")
    else {
      // keep target's value for preserved columns when the key existed
      val old = target.select(
        (keys.map(col) ++ preserve.map(c => col(c).as(s"__old_$c"))): _*)
      preserve.foldLeft(
        merged.drop("__is_new").join(old, keys, "left")) { (acc, c) =>
          acc.withColumn(c, coalesce(col(s"__old_$c"), col(c)))
            .drop(s"__old_$c")
        }
    }
  }

  /** Upsert `source` into the parquet table at `path`, keyed on `keys`,
    * latest-by `versionCol` (must be totally ordered per key — callers
    * append a tie-break column when needed).
    *
    * `preserveOnUpdate`: columns whose existing-target value survives an
    * update (the reference keeps `_loaded_at`, only `_updated_at` moves).
    *
    * `partitionCols` non-empty ⇒ partition-pruned merge: only target
    * partitions present in the source delta are read/merged/swapped.
    * Contract: the partition value of a key must be stable (functionally
    * determined by the business key — true for entries, whose date is
    * part of the surrogate). A key that "moved" partitions would leave
    * its old row in the untouched partition.
    */
  def upsert(spark: SparkSession, source: DataFrame, path: String,
      keys: Seq[String], versionCol: String,
      preserveOnUpdate: Seq[String] = Nil,
      partitionCols: Seq[String] = Nil): Unit = {
    // a partition parked in __bakparts by a crashed earlier swap MUST
    // come back BEFORE the target is read — recovering only inside the
    // swap (after the merge already read a target missing that
    // partition) would let the next upsert overwrite the parked
    // history with a delta-only partition and then drop the bak
    if (partitionCols.nonEmpty) {
      val (f, target) = fs(spark, path)
      restoreBakParts(f, new Path(path + "__bakparts"), target,
        partitionCols.length)
      spark.catalog.refreshByPath(path)
    }
    readIfExists(spark, path) match {
      case None =>
        // within-batch dedup also on first load: ON CONFLICT processes a
        // batch row-by-row, so duplicate keys in one batch still collapse
        overwrite(spark,
          Dedup.keepLatest(source, keys, Seq(col(versionCol))), path,
          partitionCols)
      case Some(target) if partitionCols.isEmpty =>
        overwrite(spark,
          merge(target, source, keys, versionCol, preserveOnUpdate), path)
      case Some(target) =>
        // a source-only column must land in EVERY partition's files —
        // plain (non-mergeSchema) reads take the schema from one
        // footer, so a column present only in the touched partitions
        // would silently vanish from whole-table reads. Widening is
        // rare: pay one full rewrite for it, keep pruned merges for
        // the steady state.
        val tgtNames = target.columns.map(_.toLowerCase).toSet
        val widens = source.columns
          .exists(c => !tgtNames.contains(c.toLowerCase))
        if (widens)
          overwrite(spark,
            merge(target, source, keys, versionCol, preserveOnUpdate),
            path, partitionCols)
        else
          upsertPartitioned(spark, target, source, path, keys, versionCol,
            preserveOnUpdate, partitionCols)
    }
  }

  /** Partition-pruned merge: collect the delta's distinct partition
    * tuples (small — one row per touched partition), prune the target
    * read to those (static partition pruning at the parquet scan),
    * merge, then swap ONLY the touched partition directories under the
    * table root. Untouched partitions keep their exact files. */
  private def upsertPartitioned(spark: SparkSession, target: DataFrame,
      source: DataFrame, path: String, keys: Seq[String],
      versionCol: String, preserveOnUpdate: Seq[String],
      partitionCols: Seq[String]): Unit = {
    val parts = source.select(partitionCols.map(col): _*).distinct().collect()
    if (parts.isEmpty) return
    val touched: Column = parts.map { r =>
      partitionCols.zipWithIndex
        .map { case (c, i) => col(c) <=> lit(r.get(i)) }
        .reduce(_ && _)
    }.reduce(_ || _)
    val merged = merge(target.filter(touched), source, keys, versionCol,
      preserveOnUpdate)

    val (f, targetP) = fs(spark, path)
    val tmp = new Path(path + "__tmp")
    merged.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(tmp.toString)
    swapLeafPartitions(f, tmp, targetP, path, partitionCols.length)
    f.delete(tmp, true)
    spark.catalog.refreshByPath(path) // see overwrite()
  }

  /** Move every depth-`depth` partition directory of `tmp` into
    * `target`, parking the displaced target directory under
    * `<path>__bakparts/<rel>` so a crash mid-swap is recoverable (the
    * bak lives OUTSIDE the table root — a leftover would otherwise break
    * partition discovery). */
  private def swapLeafPartitions(f: FileSystem, tmp: Path, target: Path,
      path: String, depth: Int): Unit = {
    val bakRoot = new Path(path + "__bakparts")
    restoreBakParts(f, bakRoot, target, depth)
    val qTmp = f.makeQualified(tmp)
    def leaves(p: Path, d: Int): Seq[Path] =
      if (d == 0) Seq(p)
      else f.listStatus(p).toSeq.filter(_.isDirectory)
        .flatMap(s => leaves(s.getPath, d - 1))
    val rels = leaves(qTmp, depth)
      .map(_.toString.stripPrefix(qTmp.toString).stripPrefix("/"))
    for (rel <- rels) {
      val tgtPart = new Path(target, rel)
      val bakPart = new Path(bakRoot, rel)
      if (f.exists(tgtPart)) {
        f.mkdirs(bakPart.getParent)
        mv(f, tgtPart, bakPart)
      } else f.mkdirs(tgtPart.getParent)
      mv(f, new Path(qTmp, rel), tgtPart)
    }
    f.delete(bakRoot, true)
  }

  /** Crash recovery for the per-partition swap: any partition parked in
    * `__bakparts` whose target slot is empty is restored (the crash hit
    * between the two renames); completed slots mean the bak is stale. */
  private def restoreBakParts(f: FileSystem, bakRoot: Path, target: Path,
      depth: Int): Unit = {
    if (!f.exists(bakRoot)) return
    val qBak = f.makeQualified(bakRoot)
    def leaves(p: Path, d: Int): Seq[Path] =
      if (d == 0) Seq(p)
      else f.listStatus(p).toSeq.filter(_.isDirectory)
        .flatMap(s => leaves(s.getPath, d - 1))
    for (leaf <- leaves(qBak, depth)) {
      val rel = leaf.toString.stripPrefix(qBak.toString).stripPrefix("/")
      val tgtPart = new Path(target, rel)
      if (!f.exists(tgtPart)) {
        f.mkdirs(tgtPart.getParent)
        mv(f, leaf, tgtPart)
      }
    }
    f.delete(bakRoot, true)
  }

  /** Insert-ignore (K8): only keys absent from the target are added —
    * the ON CONFLICT DO NOTHING bridge-table pattern. */
  def insertIgnore(spark: SparkSession, source: DataFrame, path: String,
      keys: Seq[String]): Unit = {
    readIfExists(spark, path) match {
      case None => overwrite(spark, source.dropDuplicates(keys), path)
      case Some(target) =>
        // union-by-name, same evolution semantics as merge and the
        // commit-log format's insertIgnore — the TableFormat seam
        // must not drift on what an insert means: source-only columns
        // widen the table (NULL for existing rows), a narrow source
        // inserts NULLs instead of failing analysis
        val novel = source.dropDuplicates(keys)
          .join(target.select(keys.map(col): _*).distinct(), keys, "left_anti")
        overwrite(spark, target.unionByName(novel,
          allowMissingColumns = true), path)
    }
  }

  /** Full refresh (K9): TRUNCATE+INSERT equivalent. */
  def fullRefresh(spark: SparkSession, source: DataFrame, path: String): Unit =
    overwrite(spark, source, path)

  /** Partition replace (K10): rewrite only the partitions present in
    * `source` — dynamic partition overwrite, the reference's per-year
    * TRUNCATE PARTITION + INSERT. The overwrite mode is set per-write
    * (not on the shared session conf). Constraint: `source` must not
    * derive from the table at `path` — the dynamic overwrite deletes
    * matched partitions before the read completes; use `upsert` with
    * `partitionCols` when merging against existing rows. */
  def replacePartitions(spark: SparkSession, source: DataFrame, path: String,
      partitionCol: String): Unit = {
    // same footer-consistency rule as the pruned upsert: a widening
    // source must reach EVERY partition's files or plain reads drop
    // the new column. Rare case -> one full tmp-swap rewrite (which
    // also lifts the no-self-read constraint for that pass).
    val widens = readIfExists(spark, path).exists { target =>
      val tgtNames = target.columns.map(_.toLowerCase).toSet
      source.columns.exists(c => !tgtNames.contains(c.toLowerCase))
    }
    if (widens) {
      val target = spark.read.parquet(path)
      val kept = target.join(
        source.select(col(partitionCol)).distinct(),
        Seq(partitionCol), "left_anti")
      overwrite(spark,
        source.unionByName(kept, allowMissingColumns = true), path,
        Seq(partitionCol))
    } else {
      source.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCol)
        .parquet(path)
      spark.catalog.refreshByPath(path) // see overwrite()
    }
  }
}
