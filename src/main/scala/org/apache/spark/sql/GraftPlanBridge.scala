package org.apache.spark.sql

/** Bridge to `SparkSession.internalCreateDataFrame` (private[sql]) —
  * re-root a DataFrame's logical plan at its own execution RDD.
  *
  * Why: iterative operators (pagerank's round loop) derive round i+1
  * from round i; even with every round persisted, the LOGICAL plan
  * nests one full copy of the previous round per iteration, so plan
  * size — and with it per-round analysis/optimization time — grows
  * superlinearly with the iteration count. Wrapping the persisted
  * round as a LogicalRDD keeps the plan the optimizer sees O(1) per
  * round while preserving recoverability: the wrapped RDD is the
  * cached plan's execution RDD, so a lost cache block recomputes
  * through the ORIGINAL lineage (unlike a localCheckpoint, which
  * truncates lineage onto non-replicated executor-local blocks).
  */
object GraftPlanBridge {
  def flatten(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema)
  }
}
