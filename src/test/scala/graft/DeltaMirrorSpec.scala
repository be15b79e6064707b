package graft

import graft.operators.{CommitLogTableFormat => clf, DeltaExport, DeltaImport}
import graft.operators.DeltaImport.DeltaProtocolException
import org.apache.hadoop.fs.Path

/** Continuous Delta mirroring (`DeltaExport.mirror`): the zero-copy
  * `_delta_log` written into the commit-log table root must replay —
  * through [[DeltaImport]], i.e. exactly as an external Delta reader
  * would — to the SAME state as `readAt`, at every version, whether
  * the mirror ran once at the end or incrementally after each commit;
  * plus resume idempotence, vacuum interplay, schema-change metaData
  * re-emission, classic checkpoint writing (bounded replay with the
  * commit prefix gone), and the non-mirror-log refusal.
  */
class DeltaMirrorSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    d.select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def commitAll(table: String): Unit = {
    clf.upsert(spark, Seq((1L, "a", 1L), (2L, "b", 1L))
      .toDF("k", "v", "ver"), table, Seq("k"), "ver")
    clf.upsert(spark, Seq((2L, "b2", 2L), (3L, "c", 2L))
      .toDF("k", "v", "ver"), table, Seq("k"), "ver")
    clf.upsert(spark, Seq((1L, "a3", 3L))
      .toDF("k", "v", "ver"), table, Seq("k"), "ver")
  }

  test("one-shot mirror: every Delta version row-equals readAt, " +
      "re-mirror is a no-op, commitInfo carries clVersion") {
    val table = tmpDir("dm1") + "/t"
    commitAll(table)
    assert(DeltaExport.mirror(spark, table) == 3)
    (0L to 2L).foreach { dv =>
      val viaDelta = rows(DeltaImport.read(spark, table, Some(dv)))
      val viaLog = rows(clf.readAt(spark, table, dv + 1).get)
      assert(viaDelta == viaLog, s"delta $dv != cl ${dv + 1}")
    }
    assert(rows(DeltaImport.read(spark, table)) ==
      Set((1L, "a3"), (2L, "b2"), (3L, "c")))
    assert(DeltaExport.mirror(spark, table) == 0) // idempotent
    // each commit is stamped with its source version
    val text = (0 to 2).map { dv =>
      val in = fs.open(new Path(f"$table/_delta_log/$dv%020d.json"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    text.zipWithIndex.foreach { case (t, i) =>
      assert(t.contains(s""""clVersion":"${i + 1}""""))
    }
    // protocol/metaData only where required: commit 0 has both, the
    // unchanged-schema tail carries neither
    assert(text(0).contains("\"protocol\"") && text(0).contains("\"metaData\""))
    assert(!text(1).contains("\"metaData\"") && !text(2).contains("\"metaData\""))
  }

  test("incremental mirror after each commit equals the one-shot log " +
      "state at every version") {
    val inc = tmpDir("dm2i") + "/t"
    clf.upsert(spark, Seq((1L, "a", 1L), (2L, "b", 1L))
      .toDF("k", "v", "ver"), inc, Seq("k"), "ver")
    assert(DeltaExport.mirror(spark, inc) == 1)
    clf.upsert(spark, Seq((2L, "b2", 2L), (3L, "c", 2L))
      .toDF("k", "v", "ver"), inc, Seq("k"), "ver")
    assert(DeltaExport.mirror(spark, inc) == 1)
    clf.upsert(spark, Seq((1L, "a3", 3L))
      .toDF("k", "v", "ver"), inc, Seq("k"), "ver")
    assert(DeltaExport.mirror(spark, inc) == 1)

    val oneShot = tmpDir("dm2o") + "/t"
    commitAll(oneShot)
    DeltaExport.mirror(spark, oneShot)
    (0L to 2L).foreach { dv =>
      assert(rows(DeltaImport.read(spark, inc, Some(dv))) ==
        rows(DeltaImport.read(spark, oneShot, Some(dv))))
    }
  }

  test("vacuumed-before-mirroring versions collapse into a cumulative " +
      "first commit; mirrored tables keep extending after vacuum") {
    val table = tmpDir("dm3") + "/t"
    commitAll(table)
    clf.vacuum(spark, table, keepLast = 1)
    assert(DeltaExport.mirror(spark, table) == 1) // only v3 survives
    assert(rows(DeltaImport.read(spark, table)) ==
      Set((1L, "a3"), (2L, "b2"), (3L, "c")))
    clf.upsert(spark, Seq((4L, "d", 4L)).toDF("k", "v", "ver"),
      table, Seq("k"), "ver")
    assert(DeltaExport.mirror(spark, table) == 1)
    assert(rows(DeltaImport.read(spark, table)) ==
      Set((1L, "a3"), (2L, "b2"), (3L, "c"), (4L, "d")))
    // the pre-vacuum Delta head is version 1 now — version 0 was the
    // cumulative catch-up commit
    assert(DeltaImport.snapshot(spark, table).version == 1L)
  }

  test("schema change re-emits metaData and the import sees the new " +
      "schema at head, the old one in time travel") {
    val table = tmpDir("dm4") + "/t"
    clf.upsert(spark, Seq((1L, "a", 1L)).toDF("k", "v", "ver"),
      table, Seq("k"), "ver")
    clf.fullRefresh(spark, Seq((1L, "a", 7, 2L))
      .toDF("k", "v", "extra", "ver"), table)
    assert(DeltaExport.mirror(spark, table) == 2)
    val head = DeltaImport.read(spark, table)
    assert(head.schema.fieldNames.contains("extra"))
    val v0 = DeltaImport.read(spark, table, Some(0L))
    assert(!v0.schema.fieldNames.contains("extra"))
    val in = fs.open(new Path(f"$table/_delta_log/${1L}%020d.json"))
    val t1 = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    assert(t1.contains("\"metaData\""))
  }

  test("checkpointInterval writes classic checkpoints the import " +
      "resolves through, even with the commit prefix deleted") {
    val table = tmpDir("dm6") + "/t"
    commitAll(table)
    assert(DeltaExport.mirror(spark, table, checkpointInterval = 2) == 3)
    val ck = new Path(s"$table/_delta_log/00000000000000000001.checkpoint.parquet")
    assert(fs.exists(ck), "checkpoint at Delta version 1 missing")
    assert(fs.getFileStatus(ck).isFile, "checkpoint must be ONE file")
    // _last_checkpoint points at it
    val in = fs.open(new Path(s"$table/_delta_log/_last_checkpoint"))
    val lc = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    assert(lc.contains("\"version\":1"))
    // delete the pre-checkpoint commits: replay must come from the
    // checkpoint base + the tail commit
    fs.delete(new Path(s"$table/_delta_log/00000000000000000000.json"), false)
    fs.delete(new Path(s"$table/_delta_log/00000000000000000001.json"), false)
    assert(rows(DeltaImport.read(spark, table, Some(1L))) ==
      Set((1L, "a"), (2L, "b2"), (3L, "c")))           // pure checkpoint
    assert(rows(DeltaImport.read(spark, table)) ==
      Set((1L, "a3"), (2L, "b2"), (3L, "c")))          // checkpoint + tail
    intercept[DeltaProtocolException](                  // truncated prefix
      DeltaImport.read(spark, table, Some(0L)))
    // resume keeps extending from the checkpointed state
    clf.upsert(spark, Seq((4L, "d", 4L)).toDF("k", "v", "ver"),
      table, Seq("k"), "ver")
    assert(DeltaExport.mirror(spark, table, checkpointInterval = 2) == 1)
    assert(rows(DeltaImport.read(spark, table)) ==
      Set((1L, "a3"), (2L, "b2"), (3L, "c"), (4L, "d")))
    // interval 2 ⇒ the new head (Delta version 3) checkpoints too
    assert(fs.exists(new Path(
      s"$table/_delta_log/00000000000000000003.checkpoint.parquet")))
  }

  test("a _delta_log without clVersion stamps is not a mirror log: " +
      "refused, never extended") {
    val table = tmpDir("dm5") + "/t"
    clf.upsert(spark, Seq((1L, "a", 1L)).toDF("k", "v", "ver"),
      table, Seq("k"), "ver")
    fs.mkdirs(new Path(s"$table/_delta_log"))
    val out = fs.create(
      new Path(s"$table/_delta_log/00000000000000000000.json"), true)
    try out.write(
      ("""{"commitInfo":{"timestamp":1,"operation":"WRITE"}}""" + "\n" +
        s"""{"metaData":{"id":"x","schemaString":"${"{"}\\"type\\":\\"struct\\",\\"fields\\":[]${"}"}","partitionColumns":[],"configuration":{}}}""" +
        "\n").getBytes("UTF-8"))
    finally out.close()
    intercept[DeltaProtocolException](DeltaExport.mirror(spark, table))
  }
}
