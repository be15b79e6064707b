package graft

import graft.operators.{Maintenance, MergeOps}
import org.apache.spark.sql.functions._

/** Compaction + vacuum maintenance job (SURVEY.md §4 OPTIMIZE/VACUUM
  * analog). */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

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
