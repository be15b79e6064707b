package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Minimal transactional commit log over plain parquet — the
  * Delta-shaped third [[TableFormat]] binding, with no jars beyond
  * Spark itself.
  *
  * Layout under the table root:
  * {{{
  *   _log/00000000000000000001.json   // manifest: files of version 1
  *   _log/00000000000000000002.json
  *   data/v2-<uuid>/part-*.parquet    // immutable data files
  * }}}
  *
  * A manifest lists EVERY data file of its snapshot (full manifests,
  * not deltas — O(files) and self-contained). Data files are immutable
  * and never renamed; a commit is exactly one atomic rename of a fully
  * written temp manifest into `_log/<version>.json`. Readers resolve
  * the highest version present and read only its listed files, so:
  *
  *  - a crash while WRITING data files leaves orphan files no manifest
  *    references — readers still see the previous snapshot whole;
  *  - a crash between data write and manifest rename: same;
  *  - multi-partition changes (the swap emulation's weak spot — its
  *    per-partition renames expose mixed states mid-swap) commit
  *    atomically, because visibility IS the manifest.
  *
  * Single writer per table assumed (as everywhere in this repo); the
  * conditional-rename commit detects a lost race (rename onto an
  * existing version fails) and throws rather than dropping a commit.
  * Old versions stay readable until [[vacuum]] removes files
  * unreferenced by the latest manifest.
  *
  * MERGE semantics are [[MergeOps.merge]]/[[Dedup.keepLatest]] — a
  * format binding chooses storage, never meaning. Data files carry
  * partition columns as plain columns (no hive layout): snapshot reads
  * prune by parquet row-group stats instead of directory names; a
  * production binding would add per-file min/max to the manifest.
  */
object CommitLogTableFormat extends TableFormat {

  private def fs(spark: SparkSession, path: String) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def logDir(root: Path) = new Path(root, "_log")

  private def manifestPath(root: Path, version: Long) =
    new Path(logDir(root), f"$version%020d.json")

  /** Highest committed version, or None. Only fully committed
    * manifests exist under their final name (rename is atomic), so
    * listing is resolution; `.tmp-*` leftovers are ignored. */
  private def listVersions(f: FileSystem, root: Path): Seq[Long] = {
    val dir = logDir(root)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .flatMap(n => scala.util.Try(n.stripSuffix(".json").toLong).toOption)
      .sorted
  }

  private[graft] def currentVersion(f: FileSystem,
      root: Path): Option[Long] = listVersions(f, root).lastOption

  private def readManifest(f: FileSystem, root: Path,
      version: Long): Seq[String] = {
    val mp = manifestPath(root, version)
    val buf = new Array[Byte](f.getFileStatus(mp).getLen.toInt)
    val in = f.open(mp)
    try in.readFully(0, buf) finally in.close()
    val text = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
    // one relative path per line after the header line — no JSON
    // library needed to parse it back
    text.linesIterator.drop(1).filter(_.nonEmpty).toSeq
  }

  /** Write the new snapshot's data files under `data/v<version>-<uuid>`
    * and return their table-root-relative paths. Crash at any point in
    * here leaves unreferenced files only. */
  private[graft] def writeDataFiles(spark: SparkSession,
      df: DataFrame, root: Path, version: Long): Seq[String] = {
    val (f, _) = fs(spark, root.toString)
    val rel = s"data/v$version-${java.util.UUID.randomUUID()}"
    val dir = new Path(root, rel)
    df.write.mode(SaveMode.ErrorIfExists).parquet(dir.toString)
    val files = f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet"))
      .map(n => s"$rel/$n")
    if (files.nonEmpty) files
    else {
      // a 0-task write leaves no part files; a manifest must still
      // carry the snapshot SCHEMA, so force one schema-only file
      df.limit(0).repartition(1).write.mode(SaveMode.Overwrite)
        .parquet(dir.toString)
      f.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(_.endsWith(".parquet")).map(n => s"$rel/$n")
    }
  }

  /** Atomically publish `files` as `version`: temp write + one rename.
    * The rename is the commit point. */
  private[graft] def commitManifest(spark: SparkSession, root: Path,
      version: Long, files: Seq[String]): Unit = {
    val (f, _) = fs(spark, root.toString)
    f.mkdirs(logDir(root))
    val tmp = new Path(logDir(root),
      s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try {
      out.write((s"version=$version\n" + files.mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.hsync()
    } finally out.close()
    val target = manifestPath(root, version)
    if (f.exists(target) || !f.rename(tmp, target)) {
      f.delete(tmp, false)
      throw new java.io.IOException(
        s"commit of version $version at $root lost a race or failed")
    }
    spark.catalog.refreshByPath(root.toString)
  }

  private def commitSnapshot(spark: SparkSession, df: DataFrame,
      path: String): Unit = {
    val (f, root) = fs(spark, path)
    val version = currentVersion(f, root).getOrElse(0L) + 1L
    val files = writeDataFiles(spark, df, root, version)
    commitManifest(spark, root, version, files)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (f, root) = fs(spark, path)
    currentVersion(f, root).isDefined
  }

  def read(spark: SparkSession, path: String): Option[DataFrame] = {
    val (f, root) = fs(spark, path)
    currentVersion(f, root).map { v =>
      val files = readManifest(f, root, v)
        .map(rel => new Path(root, rel).toString)
      spark.read.parquet(files: _*)
    }
  }

  /** All committed snapshot versions, ascending. Immutable data files
    * plus full-manifest commits mean every listed version is readable
    * with [[readAt]] until [[vacuum]] reclaims it. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val (f, root) = fs(spark, path)
    listVersions(f, root)
  }

  /** Time travel: the snapshot exactly as committed at `version`, or
    * None if that version never existed or was vacuumed. Reproducing
    * "the corpus a model was trained on" is a first-class need of a
    * training-data pipeline — a manifest is that reproducibility
    * token. */
  def readAt(spark: SparkSession, path: String,
      version: Long): Option[DataFrame] = {
    val (f, root) = fs(spark, path)
    if (!f.exists(manifestPath(root, version))) None
    else Some {
      val files = readManifest(f, root, version)
        .map(rel => new Path(root, rel).toString)
      spark.read.parquet(files: _*)
    }
  }

  def upsert(spark: SparkSession, source: DataFrame, path: String,
      keys: Seq[String], versionCol: String,
      preserveOnUpdate: Seq[String], partitionCols: Seq[String]): Unit = {
    // partitionCols hints physical pruning, which the manifest binding
    // answers with row-group stats — semantics are identical either way
    val snapshot = read(spark, path) match {
      case None =>
        Dedup.keepLatest(source, keys, Seq(col(versionCol)))
      case Some(target) =>
        MergeOps.merge(target, source, keys, versionCol, preserveOnUpdate)
    }
    commitSnapshot(spark, snapshot, path)
  }

  def insertIgnore(spark: SparkSession, source: DataFrame, path: String,
      keys: Seq[String]): Unit = {
    val snapshot = read(spark, path) match {
      case None => source.dropDuplicates(keys)
      case Some(target) =>
        val cols = target.columns.toSeq
        target.unionByName(
          source.select(cols.map(col): _*)
            .dropDuplicates(keys)
            .join(target.select(keys.map(col): _*).distinct(), keys,
              "left_anti"))
    }
    commitSnapshot(spark, snapshot, path)
  }

  def fullRefresh(spark: SparkSession, source: DataFrame,
      path: String): Unit =
    commitSnapshot(spark, source, path)

  def replacePartitions(spark: SparkSession, source: DataFrame,
      path: String, partitionCol: String): Unit = {
    val snapshot = read(spark, path) match {
      case None => source
      case Some(target) =>
        source.unionByName(
          target.join(source.select(col(partitionCol)).distinct(),
            Seq(partitionCol), "left_anti"),
          allowMissingColumns = true)
    }
    commitSnapshot(spark, snapshot, path)
  }

  /** Delete old manifests and the data files unreferenced by the
    * LATEST manifest — time travel ends, disk comes back. Crash-safe
    * ORDER: manifests go FIRST, then data. A crash between the two
    * leaves unreferenced data files only (the next vacuum reclaims
    * them); the reverse order would leave a readable-looking old
    * manifest whose files are gone — [[readAt]]/[[versions]] would
    * advertise a snapshot that throws on first action. The latest
    * manifest's files are never touched. */
  def vacuum(spark: SparkSession, path: String): Unit = {
    val (f, root) = fs(spark, path)
    currentVersion(f, root).foreach { v =>
      val live = readManifest(f, root, v).toSet
      for (m <- f.listStatus(logDir(root)).toSeq
          .filter(_.getPath.getName.endsWith(".json"))
          .filter(_.getPath.getName.stripSuffix(".json").toLong < v))
        f.delete(m.getPath, false)
      val dataRoot = new Path(root, "data")
      if (f.exists(dataRoot)) {
        for (dir <- f.listStatus(dataRoot).toSeq.filter(_.isDirectory)) {
          val keep = f.listStatus(dir.getPath).toSeq.exists(s =>
            live.contains(s"data/${dir.getPath.getName}/${s.getPath.getName}"))
          if (!keep) f.delete(dir.getPath, true)
        }
      }
    }
  }
}
