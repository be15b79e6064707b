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
  * publishing — appending commits as the source table evolves — is
  * the separate [[mirror]] entry point, which writes a multi-commit
  * `_delta_log` into the commit-log table root itself, zero-copy.
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
        s"""{"add":{"path":"${esc(uriEncode(rel))}",""" +
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

  /** CONTINUOUS Delta mirroring — the zero-copy completion of the
    * snapshot export: write a `_delta_log` INSIDE the commit-log
    * table root (beside `_log/` and `data/`), one Delta commit per
    * commit-log version, referencing the SAME immutable parquet
    * files. No data moves, ever: commit-log manifests and Delta adds
    * are two views of one file set, so the table is simultaneously a
    * commit-log table and a Delta table, and [[DeltaImport]] (or any
    * external Delta reader) time-travels it version by version.
    *
    * Mirroring is incremental and resumable: the already-mirrored
    * state is recovered by replaying the existing `_delta_log`
    * (never from memory), each new commit-log version becomes Delta
    * version `last+1` with file-level `remove`/`add` diffs against
    * that state, and each commit file publishes atomically
    * (write-then-rename, existing commits never rewritten) — a crash
    * mid-mirror leaves a valid shorter mirror the next call
    * completes. `commitInfo.operationParameters.clVersion` records
    * the source version of every Delta commit.
    *
    * Caveats, both inherited from the formats themselves: commit-log
    * versions vacuumed before ever being mirrored are skipped (the
    * next mirrored commit carries the cumulative diff — vacuum
    * already declared that history expendable), and vacuuming data
    * files breaks Delta time travel to the versions that referenced
    * them, exactly as Delta's own VACUUM does.
    *
    * Scale: O(changed files) per mirrored version (one manifest read,
    * one file-status per new file, one parquet-footer schema probe),
    * plus the O(active files) log replay for resume state — driver
    * work in the same class as the commit protocol itself. A classic
    * CHECKPOINT (parquet action rows + `_last_checkpoint`) is written
    * after every `checkpointInterval` commits — Delta's own answer to
    * unbounded log replay — so both external readers and this
    * mirror's resume replay at most `checkpointInterval - 1` JSON
    * commits past the checkpoint base, however long the history.
    *
    * Returns the number of newly mirrored commit-log versions. */
  def mirror(spark: SparkSession, tablePath: String,
      checkpointInterval: Int = 10): Int = {
    require(checkpointInterval >= 1,
      s"checkpointInterval must be >= 1, got $checkpointInterval")
    val clVersions = CommitLogTableFormat.versions(spark, tablePath)
    if (clVersions.isEmpty) return 0
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(root, "_delta_log")

    // resume state: replay our own mirror log (absent OR empty log
    // dir — e.g. a crash between mkdirs and the first commit — is a
    // fresh mirror)
    val hasCommits = fs.exists(logDir) &&
      fs.listStatus(logDir).exists(
        _.getPath.getName.matches("""\d{20}\.json"""))
    val prior: Option[DeltaImport.DeltaSnapshot] =
      if (hasCommits) Some(DeltaImport.snapshot(spark, tablePath))
      else None
    val lastCl: Long = prior.map { _ =>
      // the clVersion stamp of the LAST mirrored commit
      val last = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
        .collect { case n if n.matches("""\d{20}\.json""") => n }
        .max
      val in = fs.open(new Path(logDir, last))
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      text.split('\n').filter(_.nonEmpty).iterator.map(mapper.readTree)
        .flatMap(n => Option(n.get("commitInfo")))
        .flatMap(ci => Option(ci.get("operationParameters")))
        .flatMap(op => Option(op.get("clVersion")))
        .map(_.asText.toLong).toSeq.headOption.getOrElse(
          throw new DeltaImport.DeltaProtocolException(
            s"$tablePath: _delta_log exists but carries no clVersion " +
              "stamp — not a mirror log; refusing to extend it"))
    }.getOrElse(-1L)

    val todo = clVersions.filter(_ > lastCl)
    if (todo.isEmpty) return 0
    fs.mkdirs(logDir)

    val tableId = java.util.UUID.nameUUIDFromBytes(
      tablePath.getBytes("UTF-8")).toString
    var deltaV: Long = prior.map(_.version + 1).getOrElse(0L)
    var liveSet: Set[String] =
      prior.map(_.files.map(_.path).toSet).getOrElse(Set.empty)
    var priorSchemaJson: Option[String] = prior.map(_.schema.json)

    todo.foreach { clV =>
      val files = CommitLogTableFormat.readManifest(fs, root, clV).toSet
      val added = (files -- liveSet).toSeq.sorted
      val removed = (liveSet -- files).toSeq.sorted
      val schemaJson =
        if (files.isEmpty) priorSchemaJson.getOrElse(
          org.apache.spark.sql.types.StructType(Nil).json)
        else spark.read.parquet(
          files.toSeq.sorted.map(r => new Path(root, r).toString): _*)
          .schema.json
      val now = fs.getFileStatus(
        CommitLogTableFormat.manifestPath(root, clV)).getModificationTime

      val metaActions =
        if (deltaV == 0L || !priorSchemaJson.contains(schemaJson)) Seq(
          s"""{"metaData":{"id":"$tableId",""" +
            s""""format":{"provider":"parquet","options":{}},""" +
            s""""schemaString":${jsonString(schemaJson)},""" +
            s""""partitionColumns":[],"configuration":{},""" +
            s""""createdTime":$now}}""")
        else Nil
      val protoActions =
        if (deltaV == 0L)
          Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""")
        else Nil
      val actions =
        Seq(s"""{"commitInfo":{"timestamp":$now,"operation":"WRITE",""" +
          s""""operationParameters":{"clVersion":"$clV"},""" +
          s""""engineInfo":"graft-commitlog-mirror"}}""") ++
        protoActions ++ metaActions ++
        removed.map(r =>
          s"""{"remove":{"path":"${esc(uriEncode(r))}",""" +
            s""""deletionTimestamp":$now,"dataChange":true}}""") ++
        added.map { r =>
          val st = fs.getFileStatus(new Path(root, r))
          s"""{"add":{"path":"${esc(uriEncode(r))}",""" +
            s""""partitionValues":{},"size":${st.getLen},""" +
            s""""modificationTime":${st.getModificationTime},""" +
            s""""dataChange":true}}"""
        }

      val commit = new Path(logDir, f"$deltaV%020d.json")
      if (!fs.exists(commit)) { // idempotent resume: never rewrite
        val tmp = new Path(logDir, f"$deltaV%020d.json__tmp")
        val out = fs.create(tmp, true)
        try out.write((actions.mkString("\n") + "\n").getBytes("UTF-8"))
        finally out.close()
        if (!fs.rename(tmp, commit))
          throw new java.io.IOException(
            s"delta mirror rename failed: $commit")
      }
      liveSet = files
      priorSchemaJson = Some(schemaJson)
      if ((deltaV + 1) % checkpointInterval == 0)
        writeCheckpoint(spark, fs, logDir, root, deltaV, tableId,
          schemaJson, liveSet)
      deltaV += 1
    }
    todo.size
  }

  /** Classic checkpoint at Delta version `deltaV`: one parquet file
    * of action rows (the live `add` set + current `metaData` +
    * `protocol`, plus a null `remove` column so readers that project
    * it find the field) named `%020d.checkpoint.parquet`, then the
    * `_last_checkpoint` pointer. Idempotent: an existing checkpoint
    * file is never rewritten (resume re-entry). The file itself
    * publishes by rename; `_last_checkpoint` is an advisory pointer
    * external readers use to skip the directory listing, written
    * last — a crash between the two leaves a valid log either way. */
  private def writeCheckpoint(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, logDir: Path, root: Path,
      deltaV: Long, tableId: String, schemaJson: String,
      liveSet: Set[String]): Unit = {
    val ck = new Path(logDir, f"$deltaV%020d.checkpoint.parquet")
    if (!fs.exists(ck)) {
      val s = spark
      import s.implicits._
      val adds = liveSet.toSeq.sorted.map { r =>
        val st = fs.getFileStatus(new Path(root, r))
        (uriEncode(r), st.getLen, st.getModificationTime)
      }
      val rows =
        adds.map(a => (Some(a),
          None: Option[(String, String)], None: Option[Int])) ++
        Seq((None, Some((tableId, schemaJson)), None),
          (None, None, Some(1)))
      val df = rows.toDF("add_t", "meta_t", "proto_t").selectExpr(
        "named_struct('path', add_t._1, " +
          "'partitionValues', cast(map() as map<string,string>), " +
          "'size', add_t._2, 'modificationTime', add_t._3, " +
          "'dataChange', false) AS add",
        "cast(null as struct<path:string,deletionTimestamp:bigint>) " +
          "AS remove",
        "named_struct('id', meta_t._1, 'schemaString', meta_t._2, " +
          "'partitionColumns', cast(array() as array<string>), " +
          "'configuration', cast(map() as map<string,string>)) " +
          "AS metaData",
        "named_struct('minReaderVersion', proto_t, " +
          "'minWriterVersion', if(proto_t is null, " +
          "cast(null as int), 2)) AS protocol")
      val tmpDir = new Path(logDir, f"__ckpt_tmp_$deltaV%020d")
      df.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
      val part = fs.listStatus(tmpDir).toSeq
        .find(_.getPath.getName.endsWith(".parquet")).getOrElse(
          throw new java.io.IOException(
            s"checkpoint write produced no parquet part: $tmpDir"))
      if (!fs.rename(part.getPath, ck))
        throw new java.io.IOException(s"checkpoint rename failed: $ck")
      fs.delete(tmpDir, true)
    }
    val lc = fs.create(new Path(logDir, "_last_checkpoint"), true)
    try lc.write(
      s"""{"version":$deltaV,"size":${liveSet.size + 2}}\n"""
        .getBytes("UTF-8"))
    finally lc.close()
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** PROTOCOL.md path encoding (see the add-path note in
    * [[writeDeltaTable]]). */
  private def uriEncode(rel: String): String =
    new java.net.URI(null, null, rel, null).getRawPath

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
