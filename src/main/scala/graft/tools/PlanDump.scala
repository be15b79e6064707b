package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Writes `.explain("formatted")` of the FINAL adaptive plan for each
  * named query to `<outDir>/<query>_<suffix>.txt` — the before/after
  * plan evidence the optimization rounds commit under `plans/rNN/`.
  *
  *   sbt "runMain graft.tools.PlanDump <outDir> <suffix> <query...>"
  *
  * Methodology matches [[Explain]]: the plan is EXECUTED first so AQE
  * finalizes stages (a pre-execution explain shows isFinalPlan=false
  * with zero codegen spans), then the formatted mode string plus a
  * one-line audit (Exchange count, join strategies, codegen spans)
  * is persisted. Uses the bench's own session shape (local[32],
  * shuffle.partitions=cpus) so plan shapes match what Bench times.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
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
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      graft.CacheRegistry.release()
      spark.catalog.clearCache()
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.queryExecution.executedPlan.execute().count()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val plan = df.queryExecution.executedPlan.toString()
      val audit = "[audit] exchanges=" +
        plan.split("\n").count(_.contains("Exchange")) +
        " broadcastHashJoins=" +
        plan.split("\n").count(_.contains("BroadcastHashJoin")) +
        " sortMergeJoins=" +
        plan.split("\n").count(_.contains("SortMergeJoin")) +
        " codegenSpans=" + Explain.codegenSpans(plan) + "\n"
      Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        (s"== $n ($suffix, sf=$sfDir) ==\n" + audit + formatted)
          .getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote ${n}_$suffix.txt  $audit")
    }
    spark.stop()
  }
}
