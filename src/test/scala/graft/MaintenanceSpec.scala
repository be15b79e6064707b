package graft

import graft.operators.{Maintenance, MergeOps}
import org.apache.spark.sql.functions._

/** Compaction + vacuum maintenance job (SURVEY.md §4 OPTIMIZE/VACUUM
  * analog). */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compactBands folds old leaves, spares the newest, stays correct") {
    import graft.operators.NearDup
    val root = tmpDir("bandcompact")
    val bandsPath = s"$root/bands"
    // 4 micro-batch leaves of real minhash bands
    def docs(ids: Seq[Long]) =
      ids.map(i => (i, s"document body number $i with plenty of " +
        s"distinct words alpha$i beta$i gamma$i")).toDF("doc_id", "text")
    for (b <- 0 to 3)
      NearDup.minhashBands(docs(Seq(b * 10L, b * 10L + 1)), "doc_id",
        "text", 12, 4)
        .write.mode("overwrite").parquet(s"$bandsPath/batch=$b")
    val before = spark.read.parquet(bandsPath)
      .drop("batch").collect().map(_.toString).sorted.toSeq

    val folded = Maintenance.compactBands(spark, bandsPath)
    assert(folded == 3)
    val fs = new org.apache.hadoop.fs.Path(bandsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaves = fs.listStatus(
      new org.apache.hadoop.fs.Path(bandsPath)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName).sorted
    // newest real leaf survives (the only replayable one); the rest
    // folded into one negative leaf
    assert(leaves == Seq("batch=-5", "batch=3"), leaves.toString)
    val after = spark.read.parquet(bandsPath)
      .drop("batch").collect().map(_.toString).sorted.toSeq
    assert(after == before)

    // the compacted index still drives incremental dedup: a duplicate
    // of existing doc 0 must be dropped via the consolidated bands
    val exDocs = docs(Seq(0L, 1L, 10L, 11L, 20L, 21L, 30L, 31L))
    val dupOf0 = Seq((100L, exDocs.filter(col("doc_id") === 0L)
      .collect()(0).getString(1))).toDF("doc_id", "text")
    val survivors = NearDup.dedupByMinhashIncremental(dupOf0, "doc_id",
      "text", spark.read.parquet(bandsPath), exDocs, threshold = 0.8)
    assert(survivors.count() == 0, "dup survived against compacted index")

    // crash recovery, published side: the marker names an EXISTING
    // consolidated leaf (batch=-5) + a source leaf whose delete the
    // crash interrupted — recovery must finish that delete
    NearDup.minhashBands(docs(Seq(77L)), "doc_id", "text", 12, 4)
      .write.mode("overwrite").parquet(s"$bandsPath/batch=99")
    val marker = new org.apache.hadoop.fs.Path(bandsPath + "_compact_pending")
    val out = fs.create(marker, false)
    out.write("batch=-5\nbatch=99".getBytes); out.close()
    Maintenance.compactBands(spark, bandsPath) // recovery path runs
    assert(!fs.exists(marker))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$bandsPath/batch=99")))
    assert(spark.read.parquet(bandsPath).drop("batch")
      .collect().map(_.toString).sorted.toSeq == before)

    // crash recovery, unpublished side: the marker names a
    // consolidated leaf that never landed — recovery must NOT delete
    // the listed source leaf (the index was untouched by the crash)
    val out2 = fs.create(marker, false)
    out2.write("batch=-99\nbatch=3".getBytes); out2.close()
    Maintenance.compactBands(spark, bandsPath)
    assert(!fs.exists(marker))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$bandsPath/batch=3")),
      "unpublished recovery deleted a live source leaf")
    assert(spark.read.parquet(bandsPath).drop("batch")
      .collect().map(_.toString).sorted.toSeq == before)
  }

  test("compact shrinks file count, preserves data, clusters by key") {
    val path = tmpDir("compact") + "/t"
    (1L to 1000L).map(i => (i, i % 7, s"v$i")).toDF("id", "k", "v")
      .repartition(20).write.parquet(path)
    val (filesBefore, _) = Maintenance.tableStats(spark, path)
    assert(filesBefore >= 20)

    Maintenance.compact(spark, path, targetFiles = 2, clusterBy = Seq("id"))
    val (filesAfter, _) = Maintenance.tableStats(spark, path)
    assert(filesAfter <= 4)
    val df = spark.read.parquet(path)
    assert(df.count() == 1000)
    assert(df.agg(sum("id")).collect()(0).getLong(0) == 500500L)
  }

  test("vacuumTmp removes orphaned __tmp dirs only") {
    val root = tmpDir("vacuum")
    val live = s"$root/gold/t"
    Seq((1L, "a")).toDF("id", "v").write.parquet(live)
    Seq((2L, "b")).toDF("id", "v").write.parquet(s"$root/gold/t__tmp")
    val removed = Maintenance.vacuumTmp(spark, root)
    assert(removed.exists(_.endsWith("t__tmp")))
    assert(MergeOps.exists(spark, live))
    assert(!MergeOps.exists(spark, s"$root/gold/t__tmp"))
    assert(spark.read.parquet(live).count() == 1)
  }
}
