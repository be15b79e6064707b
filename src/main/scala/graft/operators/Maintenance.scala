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
