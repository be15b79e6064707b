package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze layer: immutable JSONL files under hive-style partition paths
  *   bronze/{source}/[scope={s}/]entity={e}/ingestion_date={d}/run_id={r}/
  * (reference layout: src/common/lake.py:143-169,
  * src/extractors/pipedrive_bronze.py:145-146).
  *
  * Reading returns one row per raw line with full lineage — the raw
  * text is preserved verbatim (ADR-002: schema drift must never lose
  * fields; parsing to a struct happens later, alongside the raw string).
  */
object Bronze {

  def entityPath(base: String, source: String, entity: String,
      scope: Option[String] = None): String = {
    val scopePart = scope.map(s => s"scope=$s/").getOrElse("")
    s"$base/$source/${scopePart}entity=$entity"
  }

  /** Write a batch of raw JSON lines (column `line`, plus partition
    * columns) as gzip JSONL-like text under the layout. `parts` controls
    * small-file compaction (reference buffers pages for the same
    * reason, K1). */
  def write(df: DataFrame, base: String, source: String,
      parts: Int = 1): Unit = {
    val partitionCols =
      Seq("scope", "entity", "ingestion_date", "run_id")
        .filter(df.columns.contains)
    df.repartition(parts)
      .write.mode(SaveMode.Append)
      .partitionBy(partitionCols: _*)
      .option("compression", "gzip")
      .text(s"$base/$source")
  }

  /** Read raw lines with lineage: source_blob_path + per-file line
    * number + partition columns — the (blob, line) dedup key the
    * reference uses (01_stg_pipedrive.sql:24).
    *
    * Line numbering without shuffling the text: monotonically
    * increasing ids are (scanPartition << 33) + rowInPartition, i.e.
    * consecutive within a scan partition, and rows of one file stream
    * in order. A tiny per-(file, scanPartition) extent aggregate
    * (min id + row count) is broadcast back; cumulative counts of the
    * file's earlier partitions give each extent's line offset. This
    * handles BOTH packing (many small files in one scan partition —
    * per-file bases differ) and splitting (one large splittable file
    * across several partitions — per-extent offsets accumulate);
    * only (path, long) tuples are shuffled, never the corpus (a
    * row_number window here would). Tradeoff: the aggregate branch
    * decompresses the files a second time — two streaming reads beat
    * one full write+sort+read shuffle cycle, and loads are per-run
    * deltas anyway. */
  def read(spark: SparkSession, base: String, source: String,
      entity: String, scope: Option[String] = None): DataFrame = {
    // scoped sources nest scope=*/entity=*; detect which layout exists so
    // callers can read all scopes at once (scope=None on a scoped source)
    val direct = new org.apache.hadoop.fs.Path(
      entityPath(base, source, entity, scope = None))
    val fs = direct.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val path = scope match {
      case Some(_) => entityPath(base, source, entity, scope)
      case None if fs.exists(direct) => direct.toString
      case None => s"$base/$source/scope=*/entity=$entity"
    }
    val lines = spark.read
      .option("basePath", s"$base/$source")
      .text(path + "/*/*/*")
      .withColumn("source_blob_path", input_file_name())
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
    // deterministic across the two scans: same file listing -> same
    // partitions -> same ids, so the re-scan in the aggregate branch
    // sees identical __mid values
    val extents = lines
      .groupBy("source_blob_path", "__pid")
      .agg(min(col("__mid")).as("__base"), count(lit(1)).as("__cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source_blob_path").orderBy("__pid")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val offsets = extents.withColumn("__off",
      coalesce(sum(col("__cnt")).over(w), lit(0L)))
    lines.join(broadcast(offsets), Seq("source_blob_path", "__pid"))
      .withColumn("source_line_no",
        (col("__mid") - col("__base") + 1 + col("__off")).cast("int"))
      .drop("__mid", "__pid", "__base", "__cnt", "__off")
      .withColumnRenamed("value", "raw_line")
  }

  /** Prune to one run (the reference's latest-run discovery,
    * load_pipedrive_stg.py:104-137): partition filters prune at the
    * file listing, no data read for other runs. */
  def readRun(spark: SparkSession, base: String, source: String,
      entity: String, runId: String, scope: Option[String] = None): DataFrame =
    read(spark, base, source, entity, scope).filter(col("run_id") === runId)

  def latestRunId(spark: SparkSession, base: String, source: String,
      entity: String, scope: Option[String] = None): Option[String] =
    read(spark, base, source, entity, scope)
      .agg(max(col("run_id").cast("string")))
      .collect().headOption.flatMap(r => Option(r.getString(0)))
}

/** Run manifest documents (SURVEY.md §2 K2): one JSON per run under
  * `_meta/{source}/runs/run_id={r}/manifest.json` recording per-
  * scope/entity record and part counts — the reference writes the same
  * document at the end of every extraction run
  * (pipedrive_bronze.py:299-318, scope_report :217-276). Driver-side
  * metadata: tiny files via the Hadoop FS API, no Spark job.
  */
class RunManifest(spark: SparkSession, base: String) {
  private val conf = spark.sparkContext.hadoopConfiguration

  private def path(source: String, runId: String) =
    new org.apache.hadoop.fs.Path(
      s"$base/_meta/$source/runs/run_id=$runId/manifest.json")

  // minimal JSON string escaping — scope/entity/run values flow in
  // from external config and must not be able to corrupt the manifest
  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def save(source: String, runId: String,
      startedAt: java.time.Instant, finishedAt: java.time.Instant,
      reports: Seq[RunManifest.EntityReport]): Unit = {
    val p = path(source, runId)
    val fs = p.getFileSystem(conf)
    val lines = reports.map { r =>
      val scopePart =
        r.scope.map(s => s""""scope": "${esc(s)}", """).getOrElse("")
      s"""    {$scopePart"entity": "${esc(r.entity)}", """ +
        s""""mode": "${esc(r.mode)}", """ +
        s""""records": ${r.records}, "parts": ${r.parts}}"""
    }.mkString(",\n")
    val doc =
      s"""{
         |  "run_id": "${esc(runId)}",
         |  "run_started_at_utc": "$startedAt",
         |  "run_finished_at_utc": "$finishedAt",
         |  "reports": [
         |$lines
         |  ]
         |}""".stripMargin
    // write-then-rename: a crash mid-write must not leave a torn
    // manifest in place of the previous run's record
    val tmp = new org.apache.hadoop.fs.Path(p.toString + "__tmp")
    val out = fs.create(tmp, true)
    try out.write(doc.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"manifest rename $tmp -> $p failed")
  }

  def load(source: String, runId: String): Option[String] = {
    val p = path(source, runId)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  /** Per-entity report derived from the bronze files a run just wrote
    * (records = raw lines, parts = distinct blobs) — by construction
    * the counts a silver load of the same run will see (V1
    * Audit.runCounts reconciles against this). */
  def reportFor(source: String, entity: String, runId: String,
      mode: String, scope: Option[String] = None): RunManifest.EntityReport = {
    val row = Bronze.readRun(spark, base, source, entity, runId, scope)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.countDistinct(
          org.apache.spark.sql.functions.col("source_blob_path")))
      .collect()(0)
    RunManifest.EntityReport(scope, entity, mode, row.getLong(0),
      row.getLong(1))
  }
}

object RunManifest {
  case class EntityReport(scope: Option[String], entity: String,
      mode: String, records: Long, parts: Long)
}

/** Watermark documents (SURVEY.md §2 S13): one small JSON per
  * scope+entity holding the last successful cursor, with the 5-minute
  * overlap applied on read (pipedrive_bronze.py:236-240). Stored via the
  * Hadoop FS API so the same code targets local disk or object storage.
  */
class WatermarkStore(spark: SparkSession, base: String) {
  private val conf = spark.sparkContext.hadoopConfiguration

  private def path(source: String, scope: String, entity: String) =
    new org.apache.hadoop.fs.Path(
      s"$base/_meta/$source/watermarks/scope=$scope/entity=$entity.json")

  def save(source: String, scope: String, entity: String,
      lastSuccessfulUntil: java.time.Instant): Unit = {
    val p = path(source, scope, entity)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(
      s"""{"last_successful_until": "$lastSuccessfulUntil"}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  def load(source: String, scope: String, entity: String,
      overlap: java.time.Duration = java.time.Duration.ofMinutes(5))
      : Option[java.time.Instant] = {
    val p = path(source, scope, entity)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      """"last_successful_until"\s*:\s*"([^"]+)"""".r
        .findFirstMatchIn(text)
        .map(m => java.time.Instant.parse(m.group(1)).minus(overlap))
    }
  }
}
