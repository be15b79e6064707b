package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table maintenance (SURVEY.md §4): the parquet analog of the
  * reference's VACUUM/REINDEX and of Delta OPTIMIZE/Z-ORDER —
  * small-file compaction plus optional clustering sort so parquet
  * min/max stats actually skip row groups on the clustered keys.
  */
object Maintenance {

  /** Rewrite a table into ~`targetFiles` files, optionally sorted by
    * clustering keys (Z-ORDER-lite: linear clustering gives the same
    * row-group skipping benefit on the leading key). `partitionCols`
    * MUST name the table's hive partition columns when it has them —
    * compacting a partitioned table flat would strip the layout and
    * corrupt later partitioned writes. Uses MergeOps' tmp-swap. */
  def compact(spark: SparkSession, path: String, targetFiles: Int,
      clusterBy: Seq[String] = Nil, partitionCols: Seq[String] = Nil): Unit = {
    // auto-detect a hive layout the caller didn't declare: silently
    // flattening a partitioned table corrupts the next partitioned write
    val parts =
      if (partitionCols.nonEmpty) partitionCols
      else detectPartitionCols(spark, path)
    val df0 = spark.read.parquet(path)
    val df =
      if (clusterBy.isEmpty) df0.repartition(targetFiles)
      else df0.repartitionByRange(targetFiles, clusterBy.map(col): _*)
        .sortWithinPartitions(clusterBy.map(col): _*)
    MergeOps.overwrite(spark, df, path, parts)
  }

  /** Hive partition columns of a table, derived from its `key=value`
    * directory chain (outermost first); empty for flat tables. */
  def detectPartitionCols(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val cols = scala.collection.mutable.ListBuffer[String]()
    var cur = p
    var continue = true
    while (continue) {
      val sub = fs.listStatus(cur).filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.contains("="))
      if (sub.isEmpty) continue = false
      else {
        cols += sub.head.split("=")(0)
        cur = new org.apache.hadoop.fs.Path(cur, sub.head)
      }
    }
    cols.toSeq
  }

  /** Remove orphaned `__tmp` directories left by an interrupted
    * upsert/compact (the VACUUM half). Returns removed paths. */
  def vacuumTmp(spark: SparkSession, root: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val it = fs.listFiles(p, true)
    val dirs = scala.collection.mutable.Set[String]()
    while (it.hasNext) {
      val f = it.next()
      val parts = f.getPath.toString.split("/")
      parts.zipWithIndex.collect {
        case (seg, i) if seg.endsWith("__tmp") =>
          parts.take(i + 1).mkString("/")
      }.foreach(dirs += _)
    }
    dirs.toSeq.sorted.map { d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true)
      d
    }
  }

  /** Compact a STREAMING BAND INDEX (the `batch=<id>`-leaved tables
    * [[graft.streaming.Incremental.neardupStream]] and friends write):
    * every micro-batch adds one leaf, so a year of 5-minute batches is
    * ~100k directories — the classic small-file problem, and per-batch
    * reads re-list all of them. Folds every leaf EXCEPT the newest
    * batch into one consolidated leaf.
    *
    * Two safety properties drive the shape:
    *  - the newest batch leaf is never touched: it is the only one the
    *    stream's checkpoint can still replay, and a replay OVERWRITES
    *    its `batch=<id>` leaf — which must therefore still exist as
    *    the replay's target, not be folded into a consolidated leaf
    *    the overwrite would not reach;
    *  - crash safety via a `_compact_pending` marker written BEFORE
    *    the publishing rename, naming the consolidated leaf
    *    (`batch=-(maxId+2)` — monotone, never colliding with real ids
    *    or earlier consolidations) and the source leaves. Recovery on
    *    the next call reads the marker and branches on whether the
    *    consolidated leaf exists: published → finish the source
    *    deletes; not published → discard marker + tmp, index
    *    untouched. A crash between publish and deletes leaves
    *    duplicate band rows VISIBLE but transient (removed by the
    *    next call before any new fold, so they can never be folded
    *    twice); transient duplicates only inflate band-bucket counts
    *    toward the hot-bucket guard — recall-conservative, never
    *    wrong.
    *
    * Returns the number of leaves folded (0 = nothing to do). */
  def compactBands(spark: SparkSession, bandsPath: String,
      targetFiles: Int = 8): Int = {
    val root = new org.apache.hadoop.fs.Path(bandsPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val marker = new org.apache.hadoop.fs.Path(bandsPath + "_compact_pending")
    val tmp = new org.apache.hadoop.fs.Path(bandsPath + "__tmp")
    // Recovery protocol. The marker's FIRST line is the consolidated
    // leaf, the rest are the folded source leaves, and the marker is
    // written BEFORE the publishing rename — so its presence plus the
    // existence of the consolidated leaf decides which side of the
    // crash we are on:
    //  - consolidated leaf exists → the publish happened; finish the
    //    source deletes (duplicates were transient);
    //  - consolidated leaf missing → the publish never happened; the
    //    index is untouched, so just discard marker + tmp. Either way
    //    a re-run can never fold both copies of the same rows.
    if (fs.exists(marker)) {
      val len = fs.getFileStatus(marker).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(marker)
      try in.readFully(0, buf) finally in.close()
      val lines = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
        .linesIterator.filter(_.nonEmpty).toSeq
      val dest = new org.apache.hadoop.fs.Path(root, lines.head)
      if (fs.exists(dest))
        lines.tail.foreach(rel => fs.delete(
          new org.apache.hadoop.fs.Path(root, rel), true))
      fs.delete(marker, false)
    }
    if (fs.exists(tmp)) fs.delete(tmp, true) // orphan of a dead writer
    val leaves = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .flatMap(n => scala.util.Try(
        n.stripPrefix("batch=").toLong).toOption.map(n -> _))
    if (leaves.size <= 2) return 0 // nothing worth folding
    val maxId = leaves.map(_._2).max
    val fold = leaves.filter(_._2 != maxId)
    val consolidatedId = -(math.max(maxId, -leaves.map(_._2).min) + 2)
    val destName = s"batch=$consolidatedId"
    val rows = spark.read.parquet(
      fold.map(l => s"$bandsPath/${l._1}"): _*)
    rows.repartition(targetFiles).write
      .mode(SaveMode.Overwrite).parquet(tmp.toString)
    // marker FIRST (naming dest + folds), THEN the publishing rename,
    // THEN the deletes — every crash point lands in a recovery case
    val out = fs.create(marker, false)
    try out.write((destName +: fold.map(_._1)).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dest = new org.apache.hadoop.fs.Path(root, destName)
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"rename $tmp -> $dest failed")
    fold.foreach(l => fs.delete(
      new org.apache.hadoop.fs.Path(root, l._1), true))
    fs.delete(marker, false)
    spark.catalog.refreshByPath(bandsPath)
    fold.size
  }

  /** Compact ALL of a stream's per-batch leaf assets in one
    * maintenance pass — the explicit policy the streaming corpus
    * builders' scaladocs defer to. [[graft.streaming.Incremental]]'s
    * builders each accumulate one `batch=<id>` leaf PER MICRO-BATCH
    * in every asset dir they maintain (band index, gram index,
    * (gram, df) increments, assignment index): a year of 5-minute
    * batches is ~100k directories per asset, and every batch's
    * history read re-lists all of them. This folds each dir with
    * [[compactBands]] (same newest-leaf-untouched replay contract,
    * same `_compact_pending` crash protocol, per dir independently —
    * a crash mid-pass leaves some dirs compacted and some not, each
    * internally consistent).
    *
    * CONTENT-INVARIANT by construction: folding concatenates leaf
    * rows verbatim — no aggregation — so every consumer contract
    * survives: gram/band index reads are unioned rows either way,
    * and the df asset's 'leaves sum to the full recount' invariant
    * is preserved because summing is the READER's groupBy. The
    * reserved `batch=-1` df seed leaf folds like any other (its
    * counts just travel in the consolidated leaf). Run between
    * drains, never concurrently with one.
    *
    * Returns leaves folded per dir (0 = nothing to do / missing). */
  def compactLeaves(spark: SparkSession, assetDirs: Seq[String],
      targetFiles: Int = 8): Map[String, Int] =
    assetDirs.map(d => d -> compactBands(spark, d, targetFiles)).toMap

  /** File-count + size stats for a table (the health-check side). */
  def tableStats(spark: SparkSession, path: String): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var files = 0L
    var bytes = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        files += 1
        bytes += f.getLen
      }
    }
    (files, bytes)
  }
}
