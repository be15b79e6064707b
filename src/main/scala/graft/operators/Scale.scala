package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew / co-location operators for the 100TB paths (ARCHITECTURE.md).
  *
  * AQE's skew-join splitting covers sort-merge joins automatically;
  * these are the explicit techniques for the cases AQE can't fix:
  * a broadcast-ineligible dim joined on a power-law key (saltedJoin)
  * and repeated co-located joins on the same key (bucketed tables).
  */
object Scale {

  /** Skew-tolerant equi-join: the (possibly skewed) fact side gets a
    * uniform salt, the dim side is replicated once per salt bucket, and
    * the join key becomes (key, salt) — a hot key's rows spread over
    * `buckets` tasks instead of one. Result set identical to
    * fact.join(dim, keys): salting only changes the partitioning.
    *
    * The salt must NOT be derived from the join key (the hot key would
    * land in one bucket again); monotonically_increasing_id gives a
    * uniform row-local value at zero cost.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // right/full outer would emit each unmatched dim row once per salt
    // replica — only fact-preserving join types are salt-safe
    require(Set("inner", "left", "leftouter", "semi", "leftsemi",
      "anti", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports fact-preserving join types only, got $joinType")
    val saltedFact = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedFact.join(replicatedDim, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Skew-tolerant aggregate for algebraic aggregates (sum/count/min/
    * max): pre-aggregate on (keys, salt), then merge per key. Spark's
    * partial aggregation usually makes this redundant — it exists for
    * high-cardinality-accumulator cases (e.g. collect-style state)
    * where map-side combine degrades; exposed for sum/count here.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }

  /** Write a table bucketed (and sorted) by the join key so repeated
    * joins/aggregations on that key run shuffle-free — Spark's analog
    * of the reference's B-tree-indexed FK columns. Requires a catalog
    * table (bucket metadata lives in the metastore). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables; with matching bucket specs
    * Catalyst plans a sort-merge join with NO shuffle exchange on
    * either side (asserted in ScaleSpec). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
