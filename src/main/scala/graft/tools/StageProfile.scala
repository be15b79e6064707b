package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Per-stage wall/task/CPU profile of ONE declared query — the
  * empirical half of guide §1.1 without the UI: run the named query
  * (one unmeasured warmup + one profiled run, Bench's cache-release
  * discipline), then print every completed stage with task count,
  * summed task time, CPU time and shuffle bytes, sorted by task time.
  *   sbt "runMain graft.tools.StageProfile <query> [sfDir]"
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProfile <query> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.perfConfs.foldLeft(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")) {
      case (b, (k, v)) => b.config(k, v)
    }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    // warmup (codegen/JIT), unprofiled
    graft.CacheRegistry.release(); spark.catalog.clearCache()
    fn(spark, sfDir).count()

    case class St(id: Int, name: String, tasks: Int, wallMs: Long,
      taskMs: Long, cpuMs: Long, shRead: Long, shWrite: Long,
      rdds: String)
    val stages = ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        // RDD scope names identify WHAT the stage computes (the stage
        // name only carries the action callsite) — cached frames show
        // up as InMemoryTableScan, scans as FileScan etc.
        val rdds = i.rddInfos.map(_.name).filter(_ != null).distinct
          .mkString("|").take(120)
        stages += St(i.stageId, i.name.takeWhile(_ != '\n'), i.numTasks,
          (for {s <- i.submissionTime; c <- i.completionTime} yield c - s)
            .getOrElse(-1L),
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, rdds)
      }
    })
    graft.CacheRegistry.release(); spark.catalog.clearCache()
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    // drain listener bus
    Thread.sleep(1000)
    println(f"[stageprofile] $name total ${wall}%.2fs, ${stages.size} stages")
    val sorted = stages.sortBy(-_.wallMs)
    sorted.take(40).foreach { s =>
      println(f"[stageprofile] id=${s.id}%-4d wall=${s.wallMs}%6dms tasks=${s.tasks}%-4d task=${s.taskMs}%6dms cpu=${s.cpuMs}%6dms shR=${s.shRead / 1024}%8dK shW=${s.shWrite / 1024}%8dK  ${s.rdds}")
    }
    println(f"[stageprofile] sum wall=${stages.map(_.wallMs).sum}ms over ${stages.size} stages; sum task=${stages.map(_.taskMs).sum}ms cpu=${stages.map(_.cpuMs).sum}ms")
    spark.stop()
  }
}
