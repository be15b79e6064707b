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
        "t20_embedding_dedup", "t29_pq_search", "t30_hash_sample",
        "t32_ngram_spans", "t33_pack_shards", "t34_ivfpq_search",
        "t35_ivfpq_residual", "t39_curate_to_shards",
        "t40_sketch_distinct", "t42_embedding_contamination",
        "t43_embedding_contamination_ivf", "t44_temperature_mixture",
        "t47_cdc_rolling", "t49_pack_sequences", "t50_char_lm_quality",
        "t51_repetition_signals", "t53_remove_dup_spans",
        "t54_semantic_dedup", "t55_dsir_weights",
        "t57_leakage_safe_split", "t58_source_cap",
        "t59_media_features", "t60_canonical_survivor")
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
      // AQE finalizes stages only on execution — a pre-execution plan
      // string shows AdaptiveSparkPlan isFinalPlan=false with ZERO
      // WholeStageCodegen spans. Execute the plan itself (not a
      // count() wrapper, which builds a different QueryExecution),
      // then audit the final adaptive plan.
      df.queryExecution.executedPlan.execute().count()
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
        " wholeStageCodegenSpans=" + codegenSpans(plan))
    }
    spark.stop()
  }

  /** Codegen spans in a plan string: the final adaptive plan marks
    * codegen'd operators with `*(id)` prefixes (the literal
    * WholeStageCodegen node name only appears in non-adaptive
    * treeStrings) — a span is one distinct id. */
  def codegenSpans(plan: String): Int = {
    val finalSection = plan.indexOf("== Final Plan ==") match {
      case -1 => plan
      case i =>
        // slice strictly before the Initial Plan echo — its *(id)
        // markers must not inflate the final-plan span count
        val j = plan.indexOf("== Initial Plan ==", i)
        plan.substring(i, if (j == -1) plan.length else j)
    }
    ("""\*\((\d+)\)""".r.findAllMatchIn(finalSection)
      .map(m => "s" + m.group(1)).toSet ++
      """WholeStageCodegen \((\d+)\)""".r.findAllMatchIn(finalSection)
        .map(m => "w" + m.group(1)).toSet).size
  }
}
