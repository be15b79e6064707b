package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Delta-protocol interop export for [[CommitLogTableFormat]] tables:
  * publish a committed snapshot as a directory ANY external Delta
  * reader (delta-rs, DuckDB's delta_scan, Spark+delta-jars, Trino)
  * opens transactionally — parquet part files plus a
  * `_delta_log/00000000000000000000.json` commit.
  *
  * Protocol background (public Delta transaction-log spec,
  * github.com/delta-io/delta PROTOCOL.md): a version-0 log commit is
  * newline-delimited JSON actions — `commitInfo` (informational),
  * `protocol` (minReaderVersion 1 suffices for plain parquet + JSON
  * log), `metaData` (table id, format, schemaString as a Spark
  * StructType JSON, partition columns), and one `add` per data file
  * with its relative path, partitionValues, size and dataChange
  * flag. Reader version 1 requires nothing beyond these, so the log
  * is writable with string formatting — no Delta jars, which is the
  * point: the sandboxed engine exports, an unsandboxed engine reads.
  *
  * The export is a DERIVED artifact of one immutable snapshot
  * (re-derivable from the commit-log manifest at any time): the log
  * always has exactly one commit, version 0. Continuous Delta
  * publishing (appending commits as the source table evolves) is a
  * mirroring concern, not a snapshot-export concern, and stays out of
  * scope — the commit log itself is this engine's transaction system.
  *
  * Scale: the data movement is one distributed parquet write of the
  * snapshot; the log write is driver-side string IO over the part
  * listing (O(files), the same listing any commit protocol pays).
  */
object DeltaExport {

  /** Export `version` of the commit-log table at `path` as a
    * Delta-readable directory at `outPath` (overwritten — see the
    * derived-artifact note). Returns the number of `add` actions
    * (data files) committed. `partitionCols` emits a hive layout and
    * declares the columns in `metaData.partitionColumns` with
    * per-file `partitionValues` parsed back from the directory
    * names, so partition-pruning Delta readers prune. */
  def exportDeltaSnapshot(spark: SparkSession, path: String,
      version: Long, outPath: String,
      partitionCols: Seq[String] = Nil): Int = {
    val df = CommitLogTableFormat.readAt(spark, path, version).getOrElse(
      throw new SnapshotNotFoundException(
        s"exportDeltaSnapshot: version $version at $path never " +
          "committed or was vacuumed past the retention window"))
    writeDeltaTable(spark, df, outPath, partitionCols)
  }

  /** The log-writing core, usable on any DataFrame (the export path
    * above is the committed-snapshot door). */
  def writeDeltaTable(spark: SparkSession, df: DataFrame,
      outPath: String, partitionCols: Seq[String] = Nil): Int = {
    require(partitionCols.forall(df.columns.contains),
      s"partition columns ${partitionCols.mkString(",")} must exist")
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*)
     else w).parquet(outPath)

    val root = new Path(outPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // part files relative to the table root, recursive for the
    // hive-partitioned layout; _SUCCESS and other markers excluded
    def walk(dir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        if (st.isDirectory) {
          if (st.getPath.getName.startsWith("_")) Seq.empty
          else walk(st.getPath)
        } else if (st.getPath.getName.endsWith(".parquet")) Seq(st)
        else Seq.empty
      }
    val parts = walk(root).sortBy(_.getPath.toString)
    val rootUri = root.toUri.getPath.stripSuffix("/")

    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }

    // partitionValues from the relative path's k=v segments — the
    // inverse of Spark's hive-layout encoder. That encoder escapes
    // ONLY a fixed special-char set as %XX (space and '+' stay
    // literal), so java.net.URLDecoder would corrupt a literal '+';
    // decode %XX sequences and nothing else.
    def unescapePath(s: String): String = {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '%' && i + 2 < s.length &&
            Character.digit(s.charAt(i + 1), 16) >= 0 &&
            Character.digit(s.charAt(i + 2), 16) >= 0) {
          sb.append((Character.digit(s.charAt(i + 1), 16) * 16 +
            Character.digit(s.charAt(i + 2), 16)).toChar)
          i += 3
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
    def partitionValues(rel: String): String =
      rel.split('/').dropRight(1).toSeq.flatMap { seg =>
        seg.split("=", 2) match {
          case Array(k, v) if partitionCols.contains(k) =>
            val dec = unescapePath(v)
            // hive encodes NULL partitions as the default string
            val vjson =
              if (dec == "__HIVE_DEFAULT_PARTITION__") "null"
              else s""""${esc(dec)}""""
            Some(s""""${esc(k)}": $vjson""")
          case _ => None
        }
      }.mkString("{", ", ", "}")

    // deterministic table id: an export is a re-derivable artifact,
    // so the id is a name-UUID of the output path, not a random mint
    val tableId = java.util.UUID.nameUUIDFromBytes(
      outPath.getBytes("UTF-8")).toString
    // PROTOCOL.md: schemaString is the FULL table schema; partition
    // columns are declared separately and their values live in each
    // add's partitionValues (the hive write keeps them out of the
    // part files)
    val schemaJson = df.schema.json
    val now = parts.map(_.getModificationTime).foldLeft(0L)(math.max)

    val actions = Seq(
      s"""{"commitInfo":{"timestamp":$now,""" +
        s""""operation":"WRITE","operationParameters":{"mode":"Overwrite"},""" +
        s""""engineInfo":"graft-commitlog-export"}}""",
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"$tableId",""" +
        s""""format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${jsonString(schemaJson)},""" +
        s""""partitionColumns":[${partitionCols
          .map(c => s""""${esc(c)}"""").mkString(",")}],""" +
        s""""configuration":{},"createdTime":$now}}""") ++
      parts.map { st =>
        val rel = st.getPath.toUri.getPath
          .stripPrefix(rootUri).stripPrefix("/")
        // PROTOCOL.md: add.path is URI-percent-encoded — readers
        // decode it before touching the filesystem. The multi-arg URI
        // constructor quotes every illegal char AND '%' itself, so a
        // hive-escaped dir like part=p%3Ab exports as part=p%253Ab
        // and decodes back to the literal on-disk name.
        val uriPath = new java.net.URI(null, null, rel, null).getRawPath
        s"""{"add":{"path":"${esc(uriPath)}",""" +
          s""""partitionValues":${partitionValues(rel)},""" +
          s""""size":${st.getLen},""" +
          s""""modificationTime":${st.getModificationTime},""" +
          s""""dataChange":true}}"""
      }

    val logDir = new Path(root, "_delta_log")
    fs.mkdirs(logDir)
    val commit = new Path(logDir, "00000000000000000000.json")
    val tmp = new Path(logDir, "00000000000000000000.json__tmp")
    val out = fs.create(tmp, true)
    try out.write((actions.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    // atomic publish: readers either see no Delta table or the whole
    // commit — same write-then-rename discipline as the commit log
    if (fs.exists(commit)) fs.delete(commit, false)
    if (!fs.rename(tmp, commit))
      throw new java.io.IOException(s"delta log rename failed: $commit")
    parts.size
  }

  /** JSON-encode a string that is ITSELF a JSON document
    * (schemaString is a string field whose value is the schema
    * JSON). */
  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
