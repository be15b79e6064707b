package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan auditor: prints formatted physical plans for selected queries
  * and greps the properties that matter at 100TB — predicate pushdown
  * (PushedFilters), column pruning (ReadSchema), broadcast joins, and
  * whole-stage codegen coverage.
  *   sbt "runMain graft.tools.Explain [sfDir] [query...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("s2_pushdown_filter", "a1_groupby_agg", "j1_funnel_join",
        "a10_duration", "d1_dedup_latest", "t10_ann_cosine_topk",
        "t08_minhash_pairs", "t16_neardup_survivors",
        "t17_ann_ivf_search", "t19_curate_survivors",
        "t20_embedding_dedup")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"\n=================== $n ===================")
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString()
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r
        .findAllIn(plan).toSeq.distinct
      val schemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toSeq.distinct
      println(s"[audit] pushed=${pushed.mkString(" | ")}")
      println(s"[audit] readSchema=${schemas.mkString(" | ")}")
      println(s"[audit] broadcastJoins=" +
        plan.split("\n").count(_.contains("BroadcastHashJoin")) +
        " sortMergeJoins=" +
        plan.split("\n").count(_.contains("SortMergeJoin")) +
        " wholeStageCodegenSpans=" +
        "WholeStageCodegen".r.findAllIn(plan).size)
    }
    spark.stop()
  }
}
