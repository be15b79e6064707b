package graft

import com.fasterxml.jackson.databind.JsonNode
import graft.operators.{CommitLogTableFormat, DeltaExport,
  SnapshotNotFoundException}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.StructType

/** Delta-interop export: the `_delta_log` a committed snapshot
  * publishes must be exactly what an external Delta reader needs —
  * asserted by HAND-PARSING the protocol actions (the sandbox ships
  * no Delta reader, which is the point of a jar-free export): action
  * set, full-schema schemaString, add paths/sizes matching the real
  * files, partitionValues inverting the hive layout, and the
  * reconstructed table (add list read as parquet + partitionValues)
  * row-equal to the engine-internal `readAt`.
  */
class DeltaExportSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def readLog(outPath: String): Seq[JsonNode] = {
    val p = new Path(s"$outPath/_delta_log/00000000000000000000.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    text.split('\n').filter(_.nonEmpty).toSeq.map(mapper.readTree)
  }

  test("unpartitioned export: protocol/metaData/add actions hand-parse " +
      "and the add list reads back row-equal to readAt") {
    val table = tmpDir("dx") + "/t"
    val out = tmpDir("dx_out") + "/delta"
    CommitLogTableFormat.upsert(spark,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ver"),
      table, Seq("k"), "ver")
    CommitLogTableFormat.upsert(spark,
      Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("k", "v", "ver"),
      table, Seq("k"), "ver")

    // export the FIRST version: interop must honor time travel
    val nAdds = DeltaExport.exportDeltaSnapshot(spark, table, 1L, out)
    val log = readLog(out)

    val protocol = log.flatMap(n => Option(n.get("protocol"))).head
    assert(protocol.get("minReaderVersion").asInt == 1)

    val meta = log.flatMap(n => Option(n.get("metaData"))).head
    assert(meta.get("format").get("provider").asText == "parquet")
    assert(meta.get("partitionColumns").size == 0)
    // schemaString round-trips through Spark's own StructType JSON
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(meta.get("schemaString").asText)
      .asInstanceOf[StructType]
    val v1 = CommitLogTableFormat.readAt(spark, table, 1L).get
    assert(schema == v1.schema)

    val adds = log.flatMap(n => Option(n.get("add")))
    assert(adds.size == nAdds && nAdds >= 1)
    val fs = new Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    adds.foreach { a =>
      // paths are URI-encoded per PROTOCOL.md; a reader decodes first
      val f = new Path(
        s"$out/${graft.operators.DeltaImport.decodePath(a.get("path").asText)}")
      assert(fs.exists(f), s"add path missing: $f")
      assert(fs.getFileStatus(f).getLen == a.get("size").asLong)
      assert(a.get("dataChange").asBoolean)
      assert(a.get("partitionValues").size == 0)
    }

    // the transactional contract: reading EXACTLY the add list
    // reproduces the committed snapshot (no stray files counted)
    val readBack = spark.read.schema(schema).parquet(
      adds.map(a => s"$out/${graft.operators.DeltaImport
        .decodePath(a.get("path").asText)}"): _*)
    assert(readBack.select("k", "v").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b")))

    // no torn temp file left beside the commit
    assert(!fs.exists(new Path(
      s"$out/_delta_log/00000000000000000000.json__tmp")))
  }

  test("partitioned export: hive layout inverts into partitionValues " +
      "and reconstruction equals the snapshot") {
    val table = tmpDir("dxp") + "/t"
    val out = tmpDir("dxp_out") + "/delta"
    CommitLogTableFormat.upsert(spark,
      Seq((1L, "x=1 space", "p a", 1L), (2L, "bee", "p a", 1L),
        (3L, "cee", "p:b", 1L)).toDF("k", "v", "part", "ver"),
      table, Seq("k"), "ver")
    DeltaExport.exportDeltaSnapshot(spark, table, 1L, out,
      partitionCols = Seq("part"))
    val log = readLog(out)
    val meta = log.flatMap(n => Option(n.get("metaData"))).head
    assert(meta.get("partitionColumns").get(0).asText == "part")
    // the full schema INCLUDES the partition column per PROTOCOL.md
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(meta.get("schemaString").asText)
      .asInstanceOf[StructType]
    assert(schema.fieldNames.contains("part"))

    val adds = log.flatMap(n => Option(n.get("add")))
    assert(adds.nonEmpty)
    // reconstruct rows the way a Delta reader does: file contents +
    // that file's partitionValues
    val rows = adds.flatMap { a =>
      val pv = a.get("partitionValues").get("part").asText
      spark.read.parquet(s"$out/${graft.operators.DeltaImport
        .decodePath(a.get("path").asText)}")
        .select("k", "v").collect()
        .map(r => (r.getLong(0), r.getString(1), pv))
    }.toSet
    assert(rows == Set((1L, "x=1 space", "p a"), (2L, "bee", "p a"),
      (3L, "cee", "p:b")))
    // add.path is URI-encoded per PROTOCOL.md: hive leaves the space
    // literal on disk (→ %20 in the log) and %XX-escapes ':' on disk
    // (→ the '%' re-encodes as %25); partitionValues stay DECODED
    assert(adds.exists(_.get("path").asText.contains("part=p%20a")))
    assert(adds.exists(_.get("path").asText.contains("part=p%253Ab")))
  }

  test("missing or vacuumed version raises the typed exception") {
    val table = tmpDir("dxm") + "/t"
    CommitLogTableFormat.upsert(spark,
      Seq((1L, "a", 1L)).toDF("k", "v", "ver"), table, Seq("k"), "ver")
    intercept[SnapshotNotFoundException](
      DeltaExport.exportDeltaSnapshot(spark, table, 99L,
        tmpDir("dxm_out") + "/delta"))
  }
}
