package graft.operators

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{BinaryType, DataType, StructType}

import scala.collection.mutable

/** Reader side of the jar-free Delta-protocol interop (the writer is
  * [[DeltaExport]]): open a `_delta_log` directory written by ANY
  * Delta writer (delta-rs, Spark+delta jars, Trino, or our own
  * export), replay the transaction log to a snapshot, and return the
  * active file set as a DataFrame — optionally at a past version
  * (`versionAsOf`, the Delta time-travel contract).
  *
  * Protocol background (public Delta transaction-log spec,
  * github.com/delta-io/delta PROTOCOL.md): a snapshot at version V is
  * the latest classic checkpoint at C <= V (parquet rows of the same
  * actions) plus the JSON commits C+1..V replayed in order — `add`
  * inserts a file keyed by path, `remove` deletes it, the latest
  * `metaData`/`protocol` win, everything else (`commitInfo`, `txn`,
  * `cdc`, `domainMetadata`) is snapshot-irrelevant. `add.path` is
  * URI-percent-encoded and relative to the table root (or absolute).
  *
  * Honest protocol boundary, enforced not assumed: reader version 1
  * and 2 (2 only without column mapping) are supported; version-3
  * reader features (deletion vectors, column mapping, v2 checkpoints,
  * type widening...) are REJECTED with a typed error rather than
  * silently misread — a reader that ignores a deletion vector
  * resurrects deleted rows. Multi-part classic checkpoints are
  * supported; UUID-named v2 checkpoints are not (their presence is
  * fine when the JSON commits still cover the requested version —
  * the spec requires readers to ignore unrecognized log files).
  *
  * Scale: snapshot state is O(active files) on the driver — the same
  * cost every Delta client pays (the log IS a driver-side manifest);
  * checkpoint parquet is read distributed and only the three action
  * columns are collected (never `stats` strings). The data read is a
  * plain schema'd parquet scan over exactly the active file list, so
  * column pruning and predicate pushdown apply as on any scan;
  * partitioned tables read one file group per DISTINCT partition
  * value with the partition columns attached as literals — O(number
  * of partitions) planning, the identical cost of hive partition
  * discovery, with per-file pruning left to Spark.
  */
object DeltaImport {

  /** A live data file in the reconstructed snapshot. `path` is
    * URI-decoded; `partitionValues` carries None for null partitions
    * (hive default-partition semantics). */
  final case class AddEntry(
      path: String,
      partitionValues: Map[String, Option[String]],
      size: Long)

  /** Replayed snapshot state: everything a reader needs before
    * touching data files. */
  final case class DeltaSnapshot(
      version: Long,
      schema: StructType,
      partitionColumns: Seq[String],
      configuration: Map[String, String],
      files: Seq[AddEntry])

  /** The table requires protocol capabilities this reader does not
    * have (or the log is malformed/truncated) — reading anyway would
    * be silently wrong, so it is a typed failure. */
  final class DeltaProtocolException(msg: String)
    extends RuntimeException(msg)

  private val CommitRe = """^(\d{20})\.json$""".r
  private val CkptSingleRe = """^(\d{20})\.checkpoint\.parquet$""".r
  private val CkptMultiRe =
    """^(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet$""".r

  /** Replay the log at `tablePath/_delta_log` to the snapshot state
    * at `versionAsOf` (default: the latest version present). */
  def snapshot(spark: SparkSession, tablePath: String,
      versionAsOf: Option[Long] = None): DeltaSnapshot = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(root, "_delta_log")
    if (!fs.exists(logDir))
      throw new DeltaProtocolException(
        s"$tablePath is not a Delta table: no _delta_log directory")

    val names = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
    val commits: Map[Long, Path] = names.collect {
      case n @ CommitRe(v) => v.toLong -> new Path(logDir, n)
    }.toMap
    // classic checkpoints only; a multi-part checkpoint is usable
    // only when all of its declared parts are present
    val singleCkpts: Map[Long, Seq[Path]] = names.collect {
      case n @ CkptSingleRe(v) => v.toLong -> Seq(new Path(logDir, n))
    }.toMap
    val multiCkpts: Map[Long, Seq[Path]] = names.collect {
      case n @ CkptMultiRe(v, _, total) => (v.toLong, total.toInt, n)
    }.groupBy(_._1).collect {
      case (v, parts) if parts.map(_._3).distinct.size == parts.head._2 =>
        v -> parts.map(p => new Path(logDir, p._3)).sortBy(_.getName)
    }
    val checkpoints = singleCkpts ++ multiCkpts

    val maxSeen = (commits.keySet ++ checkpoints.keySet)
      .foldLeft(-1L)(math.max)
    if (maxSeen < 0)
      throw new DeltaProtocolException(
        s"$tablePath: _delta_log holds no readable commit or classic " +
          "checkpoint (a v2/uuid-named checkpoint alone is unsupported)")
    val target = versionAsOf.getOrElse(maxSeen)
    if (target < 0 || target > maxSeen)
      throw new DeltaProtocolException(
        s"$tablePath: version $target was never committed " +
          s"(latest is $maxSeen)")

    val base: Option[Long] =
      checkpoints.keySet.filter(_ <= target).maxOption
    val replayFrom = base.map(_ + 1).getOrElse(0L)
    val missing = (replayFrom to target).filterNot(commits.contains)
    if (missing.nonEmpty)
      throw new DeltaProtocolException(
        s"$tablePath: log is truncated at version $target — commits " +
          s"${missing.mkString(",")} are absent and no usable classic " +
          "checkpoint covers them")

    // ---- state ----
    val live = mutable.LinkedHashMap.empty[String, AddEntry]
    var schemaJson: Option[String] = None
    var partCols: Seq[String] = Nil
    var config: Map[String, String] = Map.empty
    var minReader = 1
    var readerFeatures: Set[String] = Set.empty

    base.foreach { v =>
      val ck = spark.read.parquet(checkpoints(v).map(_.toString): _*)
      val ckCols = ck.schema.fieldNames.toSet

      if (ckCols.contains("metaData")) {
        val metas = ck.filter(col("metaData.id").isNotNull)
          .select(col("metaData.schemaString"),
            col("metaData.partitionColumns"),
            col("metaData.configuration")).collect()
        metas.lastOption.foreach { r =>
          schemaJson = Some(r.getString(0))
          partCols = r.getSeq[String](1)
          config = Option(r.getMap[String, String](2))
            .map(_.toMap).getOrElse(Map.empty)
        }
      }
      if (ckCols.contains("protocol")) {
        val protoDf = ck.filter(col("protocol.minReaderVersion").isNotNull)
        val hasFeatures = protoDf.schema("protocol").dataType
          .asInstanceOf[StructType].fieldNames.contains("readerFeatures")
        val protos = (if (hasFeatures)
          protoDf.select(col("protocol.minReaderVersion"),
            col("protocol.readerFeatures"))
        else
          protoDf.select(col("protocol.minReaderVersion"),
            lit(null).cast("array<string>"))).collect()
        protos.lastOption.foreach { r =>
          minReader = r.getInt(0)
          readerFeatures =
            if (r.isNullAt(1)) Set.empty
            else r.getSeq[String](1).toSet
        }
      }
      if (ckCols.contains("add")) {
        val addDf = ck.filter(col("add.path").isNotNull)
        val addFields = addDf.schema("add").dataType
          .asInstanceOf[StructType].fieldNames.toSet
        if (addFields.contains("deletionVector") &&
            addDf.filter(col("add.deletionVector.storageType")
              .isNotNull).limit(1).count() > 0)
          throw new DeltaProtocolException(
            s"$tablePath: checkpoint $v carries deletion vectors — " +
              "unsupported (reading without them resurrects deleted rows)")
        // only the three needed columns cross to the driver — never
        // the per-file stats strings
        addDf.select(col("add.path"), col("add.partitionValues"),
          col("add.size")).collect().foreach { r =>
          val raw = r.getString(0)
          val pv = Option(r.getMap[String, String](1))
            .map(_.toMap.map { case (k, v2) => k -> Option(v2) })
            .getOrElse(Map.empty[String, Option[String]])
          live(decodePath(raw)) = AddEntry(decodePath(raw), pv,
            if (r.isNullAt(2)) 0L else r.getLong(2))
        }
      }
    }

    val mapper = new ObjectMapper()
    (replayFrom to target).foreach { v =>
      val in = fs.open(commits(v))
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.split('\n').iterator.filter(_.nonEmpty).foreach { line =>
        val node =
          try mapper.readTree(line)
          catch {
            case e: Exception => throw new DeltaProtocolException(
              s"$tablePath: commit $v holds malformed JSON: " +
                s"${e.getMessage}")
          }
        applyAction(node, v, tablePath, live,
          sj => schemaJson = Some(sj), pc => partCols = pc,
          cf => config = cf, mr => minReader = mr,
          rf => readerFeatures = rf)
      }
    }

    // protocol gate AFTER replay: the latest protocol action governs
    if (minReader >= 3 && readerFeatures.nonEmpty)
      throw new DeltaProtocolException(
        s"$tablePath: requires reader features " +
          s"${readerFeatures.toSeq.sorted.mkString(", ")} — none are " +
          "supported by this reader")
    if (minReader > 3)
      throw new DeltaProtocolException(
        s"$tablePath: minReaderVersion $minReader is unsupported")
    if (config.get("delta.columnMapping.mode").exists(_ != "none"))
      throw new DeltaProtocolException(
        s"$tablePath: column mapping mode " +
          s"'${config("delta.columnMapping.mode")}' is unsupported " +
          "(physical names would be misread as logical)")

    val sj = schemaJson.getOrElse(throw new DeltaProtocolException(
      s"$tablePath: no metaData action in the log — schema unknown"))
    val schema =
      try DataType.fromJson(sj).asInstanceOf[StructType]
      catch {
        case e: Exception => throw new DeltaProtocolException(
          s"$tablePath: schemaString does not parse as a Spark " +
            s"StructType: ${e.getMessage}")
      }
    DeltaSnapshot(target, schema, partCols, config, live.values.toSeq)
  }

  /** Read the snapshot as a DataFrame (see [[snapshot]] for the
    * replay rules; this adds the data scan). */
  def read(spark: SparkSession, tablePath: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, tablePath, versionAsOf)
    val partSet = snap.partitionColumns.toSet
    val dataSchema = StructType(
      snap.schema.fields.filterNot(f => partSet.contains(f.name)))
    val ordered = snap.schema.fieldNames.map(col).toSeq

    snap.partitionColumns.foreach { pc =>
      val f = snap.schema.fields.find(_.name == pc).getOrElse(
        throw new DeltaProtocolException(
          s"$tablePath: partition column $pc missing from the schema"))
      if (f.dataType == BinaryType)
        throw new DeltaProtocolException(
          s"$tablePath: binary partition column $pc is unsupported " +
            "(no lossless string round-trip)")
    }

    if (snap.files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        snap.schema)

    def abs(p: String): String =
      if (p.startsWith("/") || p.contains("://")) p
      else s"$tablePath/$p"

    if (snap.partitionColumns.isEmpty) {
      spark.read.schema(dataSchema)
        .parquet(snap.files.map(f => abs(f.path)): _*)
        .select(ordered: _*)
    } else {
      // one scan per distinct partition tuple; partition columns are
      // attached as typed literals exactly as the protocol specifies
      // (the part files do not contain them)
      snap.files.groupBy(_.partitionValues).map { case (pv, fl) =>
        val base = spark.read.schema(dataSchema)
          .parquet(fl.map(f => abs(f.path)): _*)
        snap.partitionColumns.foldLeft(base) { (df, pc) =>
          val dt = snap.schema.fields.find(_.name == pc).get.dataType
          val v = pv.getOrElse(pc, None)
          df.withColumn(pc,
            v.map(s => lit(s).cast(dt))
              .getOrElse(lit(null).cast(dt)))
        }.select(ordered: _*)
      }.reduce(_.unionByName(_))
    }
  }

  /** Apply one JSON action line to the replay state. */
  private def applyAction(node: JsonNode, version: Long,
      tablePath: String,
      live: mutable.LinkedHashMap[String, AddEntry],
      setSchema: String => Unit, setPartCols: Seq[String] => Unit,
      setConfig: Map[String, String] => Unit, setMinReader: Int => Unit,
      setFeatures: Set[String] => Unit): Unit = {
    val add = node.get("add")
    val remove = node.get("remove")
    val meta = node.get("metaData")
    val proto = node.get("protocol")
    if (add != null && !add.isNull) {
      val dv = add.get("deletionVector")
      if (dv != null && !dv.isNull)
        throw new DeltaProtocolException(
          s"$tablePath: commit $version adds a file with a deletion " +
            "vector — unsupported (reading without it resurrects " +
            "deleted rows)")
      val raw = textOf(add, "path").getOrElse(
        throw new DeltaProtocolException(
          s"$tablePath: commit $version has an add action without a path"))
      val pvNode = add.get("partitionValues")
      val pv: Map[String, Option[String]] =
        if (pvNode == null || pvNode.isNull) Map.empty
        else {
          val it = pvNode.properties().iterator()
          val b = Map.newBuilder[String, Option[String]]
          while (it.hasNext) {
            val e = it.next()
            b += e.getKey ->
              (if (e.getValue.isNull) None else Some(e.getValue.asText))
          }
          b.result()
        }
      val size = Option(add.get("size")).filterNot(_.isNull)
        .map(_.asLong).getOrElse(0L)
      val p = decodePath(raw)
      live(p) = AddEntry(p, pv, size)
    } else if (remove != null && !remove.isNull) {
      textOf(remove, "path").foreach(raw => live.remove(decodePath(raw)))
    } else if (meta != null && !meta.isNull) {
      textOf(meta, "schemaString").foreach(setSchema)
      Option(meta.get("partitionColumns")).filterNot(_.isNull)
        .foreach { arr =>
          setPartCols((0 until arr.size).map(i => arr.get(i).asText))
        }
      Option(meta.get("configuration")).filterNot(_.isNull)
        .foreach { cfg =>
          val it = cfg.properties().iterator()
          val b = Map.newBuilder[String, String]
          while (it.hasNext) {
            val e = it.next()
            if (!e.getValue.isNull) b += e.getKey -> e.getValue.asText
          }
          setConfig(b.result())
        }
    } else if (proto != null && !proto.isNull) {
      Option(proto.get("minReaderVersion")).filterNot(_.isNull)
        .foreach(n => setMinReader(n.asInt))
      Option(proto.get("readerFeatures")).filterNot(_.isNull)
        .foreach { arr =>
          setFeatures((0 until arr.size).map(i => arr.get(i).asText).toSet)
        }
    }
    // commitInfo / txn / cdc / domainMetadata: snapshot-irrelevant
  }

  private def textOf(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText)

  /** PROTOCOL.md: `path` is URI-percent-encoded — decode it; a raw
    * path from a non-compliant writer that does not parse as a URI is
    * used verbatim (lenient fallback, matching delta-rs). */
  private[graft] def decodePath(raw: String): String =
    try {
      val u = new java.net.URI(raw)
      if (u.getScheme != null) raw // absolute URI: keep as written
      else Option(u.getPath).getOrElse(raw)
    } catch { case _: java.net.URISyntaxException => raw }
}
