package graft

import graft.operators.{DeltaExport, DeltaImport}
import graft.operators.DeltaImport.DeltaProtocolException
import org.apache.hadoop.fs.Path

/** Delta-protocol log READER: multi-commit replay (add/remove,
  * latest metaData/protocol win), time travel, classic-checkpoint
  * base + tail replay, URI path decoding round-tripped against the
  * export side, and the typed rejections for protocol capabilities
  * this reader does not have (deletion vectors, column mapping,
  * reader features, truncated logs).
  */
class DeltaImportSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeText(path: String, text: String): Unit = {
    val out = fs.create(new Path(path), true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  /** Write a one-part parquet of `df` and copy the single part file
    * to `destFile` (a FILE path, the shape checkpoints and hand-made
    * data files need). Returns the file length. */
  private def writeSingleParquet(df: org.apache.spark.sql.DataFrame,
      scratch: String, destFile: String): Long = {
    df.coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = fs.listStatus(new Path(scratch))
      .find(_.getPath.getName.endsWith(".parquet")).get.getPath
    org.apache.hadoop.fs.FileUtil.copy(fs, part, fs,
      new Path(destFile), false, spark.sparkContext.hadoopConfiguration)
    fs.getFileStatus(new Path(destFile)).getLen
  }

  test("round-trip + multi-commit replay + time travel: a hand-appended " +
      "commit removes a file and adds another; versionAsOf honors both") {
    val out = tmpDir("di") + "/delta"
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    DeltaExport.writeDeltaTable(spark, df, out)

    val v0 = DeltaImport.read(spark, out)
    assert(v0.schema.fieldNames.toSeq == Seq("k", "v"))
    val all = Set((1L, "a"), (2L, "b"), (3L, "c"))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(v0) == all)

    // commit 1, written as an external Delta writer would: remove the
    // first committed file, add a fresh one
    val log0 = {
      val in = fs.open(new Path(s"$out/_delta_log/00000000000000000000.json"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val removedEnc = log0.split('\n').filter(_.contains("\"add\""))
      .head.split("\"path\":\"")(1).split("\"")(0)
    val removedRows = rows(spark.read.parquet(
      s"$out/${DeltaImport.decodePath(removedEnc)}"))
    assert(removedRows.nonEmpty && removedRows.subsetOf(all))
    val extraLen = writeSingleParquet(Seq((9L, "z")).toDF("k", "v"),
      tmpDir("di_scratch"), s"$out/extra-00001.parquet")
    writeText(s"$out/_delta_log/00000000000000000001.json",
      s"""{"commitInfo":{"timestamp":1}}
         |{"remove":{"path":"$removedEnc","dataChange":true}}
         |{"add":{"path":"extra-00001.parquet","partitionValues":{},"size":$extraLen,"modificationTime":1,"dataChange":true}}
         |""".stripMargin)

    val v1 = DeltaImport.read(spark, out)
    assert(rows(v1) == all -- removedRows + ((9L, "z")))
    assert(rows(DeltaImport.read(spark, out, versionAsOf = Some(0L))) == all)
    assert(DeltaImport.snapshot(spark, out).version == 1L)
    intercept[DeltaProtocolException](
      DeltaImport.read(spark, out, versionAsOf = Some(2L)))
  }

  test("partitioned round-trip: special chars and a NULL partition " +
      "value survive encode/decode and reattach typed") {
    val out = tmpDir("dip") + "/delta"
    val df = Seq((1L, "x", Some("p a")), (2L, "y", Some("p:b")),
      (3L, "z", None)).toDF("k", "v", "part")
    DeltaExport.writeDeltaTable(spark, df, out, partitionCols = Seq("part"))
    val back = DeltaImport.read(spark, out)
    assert(back.schema.fieldNames.toSeq == Seq("k", "v", "part"))
    val got = back.collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSet
    assert(got == Set((1L, "x", Some("p a")), (2L, "y", Some("p:b")),
      (3L, "z", None)))
  }

  test("classic checkpoint is the replay base: commits before it may " +
      "be vacuumed, the tail still applies; versions under it error") {
    val out = tmpDir("dick") + "/delta"
    fs.mkdirs(new Path(s"$out/_delta_log"))
    val data = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val len0 = writeSingleParquet(data, tmpDir("dick_s0"), s"$out/d0.parquet")
    val len1 = writeSingleParquet(Seq((3L, "c")).toDF("k", "v"),
      tmpDir("dick_s1"), s"$out/d1.parquet")

    // checkpoint at version 1 (single-part classic): the live add,
    // the metaData and the protocol — as parquet action rows
    val schemaJson = data.schema.json
    val ck = Seq(
      (Some(("d0.parquet", Map.empty[String, String], len0, true)),
        None: Option[(String, String, Seq[String],
          Map[String, String])], None: Option[Int]),
      (None, Some(("t1", schemaJson, Seq.empty[String],
        Map.empty[String, String])), None),
      (None, None, Some(1)))
      .toDF("add_t", "metaData_t", "protocol_t")
      .selectExpr(
        "named_struct('path', add_t._1, 'partitionValues', add_t._2, " +
          "'size', add_t._3, 'dataChange', add_t._4) AS add",
        "named_struct('id', metaData_t._1, 'schemaString', metaData_t._2, " +
          "'partitionColumns', metaData_t._3, 'configuration', " +
          "metaData_t._4) AS metaData",
        // Option[Int] encodes as a bare nullable INT, not a struct
        "named_struct('minReaderVersion', protocol_t) AS protocol")
    writeSingleParquet(ck, tmpDir("dick_ck"),
      s"$out/_delta_log/00000000000000000001.checkpoint.parquet")

    // only the post-checkpoint commit exists as JSON
    writeText(s"$out/_delta_log/00000000000000000002.json",
      s"""{"add":{"path":"d1.parquet","partitionValues":{},"size":$len1,"modificationTime":1,"dataChange":true}}
         |""".stripMargin)

    val got = DeltaImport.read(spark, out).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(DeltaImport.snapshot(spark, out).version == 2L)
    // version 0 predates the checkpoint and its commit was vacuumed
    intercept[DeltaProtocolException](
      DeltaImport.read(spark, out, versionAsOf = Some(0L)))
  }

  test("typed rejections: reader features, column mapping, deletion " +
      "vectors, non-tables") {
    val schemaJson = Seq((1L, "a")).toDF("k", "v").schema.json
    def mkLog(dir: String, lines: String*): String = {
      fs.mkdirs(new Path(s"$dir/_delta_log"))
      writeText(s"$dir/_delta_log/00000000000000000000.json",
        lines.mkString("", "\n", "\n"))
      dir
    }
    val meta = s"""{"metaData":{"id":"t","schemaString":${jstr(schemaJson)},"partitionColumns":[],"configuration":{}}}"""

    val v3 = mkLog(tmpDir("dir3") + "/d",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}""",
      meta)
    val e1 = intercept[DeltaProtocolException](DeltaImport.read(spark, v3))
    assert(e1.getMessage.contains("deletionVectors"))

    val cm = mkLog(tmpDir("dircm") + "/d",
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"t","schemaString":${jstr(schemaJson)},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"}}}""")
    assert(intercept[DeltaProtocolException](DeltaImport.read(spark, cm))
      .getMessage.contains("column mapping"))

    val dv = mkLog(tmpDir("dirdv") + "/d", meta,
      """{"add":{"path":"x.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"x","offset":1,"sizeInBytes":1,"cardinality":1}}}""")
    assert(intercept[DeltaProtocolException](DeltaImport.read(spark, dv))
      .getMessage.contains("deletion"))

    intercept[DeltaProtocolException](
      DeltaImport.read(spark, tmpDir("dirnone") + "/nope"))
  }

  test("log fuzz totality: byte-mutated and garbage commits terminate " +
      "in an exception or a truthful subset read — never a hang, " +
      "never fabricated rows") {
    val out = tmpDir("difz") + "/delta"
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    DeltaExport.writeDeltaTable(spark, df, out)
    val truth = Set((1L, "a"), (2L, "b"), (3L, "c"))
    val commit = new Path(s"$out/_delta_log/00000000000000000000.json")
    val orig = {
      val in = fs.open(commit)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        buf.toByteArray
      } finally in.close()
    }
    val rnd = new scala.util.Random(0xD1F2)
    var okReads = 0
    var raised = 0
    (0 until 40).foreach { _ =>
      val b = orig.clone()
      (0 to rnd.nextInt(3)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      writeText(commit.toString, new String(b, "UTF-8"))
      val got: Option[Set[(Long, String)]] =
        try Some(DeltaImport.read(spark, out).collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet)
        catch { case _: Exception => None }
      got match {
        case Some(g) =>
          // a surviving read may have LOST an action (mutated key name
          // ignored) but can never invent rows the data files don't hold
          assert(g.subsetOf(truth), s"fabricated rows: ${g -- truth}")
          okReads += 1
        case None => raised += 1
      }
    }
    // pure-garbage commit: must be the typed error, not a hang
    writeText(commit.toString,
      new String(Array.fill(256)(rnd.nextInt(256).toByte), "UTF-8"))
    intercept[DeltaProtocolException](DeltaImport.read(spark, out))
    writeText(commit.toString, new String(orig, "UTF-8")) // restore
    assert(rows(DeltaImport.read(spark, out)) == truth)
    assert(okReads + raised == 40)
  }

  private def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    d.select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  /** JSON-encode a string value (the schemaString embed). */
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
