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

  /** Bounded-candidate range join: left row pairs with right rows of
    * the same keys whose timestamp lies in [leftTs, leftTs+tolerance].
    * Instead of the quadratic theta-join, both sides bucket by
    * floor(ts / tolerance) and the right side replicates into its own
    * and the previous bucket — every qualifying pair shares a bucket,
    * so the equi-join machinery (hash/SMJ, AQE, skew splitting) does
    * the work and candidates per row stay O(rows per 2 buckets).
    * Timestamp columns must be pre-renamed to avoid collisions. */
  def boundedRangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftMicros: String, rightMicros: String,
      toleranceMicros: Long): DataFrame = {
    require(toleranceMicros > 0)
    val l = left.withColumn("__b",
      floor(col(leftMicros) / toleranceMicros))
    val r = right.withColumn("__b", explode(array(
      floor(col(rightMicros) / toleranceMicros),
      floor(col(rightMicros) / toleranceMicros) - 1)))
    l.join(r, keys :+ "__b")
      .filter(col(rightMicros) >= col(leftMicros) &&
        col(rightMicros) - col(leftMicros) <= toleranceMicros)
      .drop("__b")
  }

  /** As-of join: for each left row, the latest right value whose
    * timestamp is <= the left timestamp, per key — the classic
    * enrichment join (latest price before a sale). Implemented with
    * the union + running-last-value trick: one shuffle on the keys, a
    * single window pass, no range blow-up. The right payload must be
    * packed into one column (`rightValue`) by the caller; ties at the
    * same timestamp resolve to the right row (inclusive <=) and among
    * equal right timestamps to the last by `rightTiebreak`.
    *
    * A right row whose `rightValue` is NULL still WINS the as-of match
    * and yields NULL (true ASOF semantics, matching DuckDB's ASOF
    * JOIN): the payload rides inside a never-null marker struct so
    * `last(ignoreNulls)` skips only interleaved left rows, not
    * null-valued right rows. */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftMicros: String, rightMicros: String, rightValue: String,
      rightTiebreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{IntegerType, StructType}
    val packedT = new StructType()
      .add("m", IntegerType, nullable = false)
      .add("v", right.schema(rightValue).dataType)
    val l = left
      .withColumn("__ts", col(leftMicros))
      .withColumn("__is_left", lit(1))
      .withColumn("__val", lit(null).cast(packedT))
      .withColumn("__tb", lit(null).cast(
        right.schema(rightTiebreak).dataType))
    val r = right
      .select((keys.map(col) :+ col(rightMicros).as("__ts") :+
        lit(0).as("__is_left") :+
        struct(lit(1).as("m"), col(rightValue).as("v")).as("__val") :+
        col(rightTiebreak).as("__tb")): _*)
    val unioned = l.select(
      (l.columns.filterNot(r.columns.contains).map(col).toSeq ++
        keys.map(col) :+ col("__ts") :+ col("__is_left") :+
        col("__val") :+ col("__tb")): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_left").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__asof",
        last(col("__val"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("__is_left") === 1)
      .drop("__ts", "__is_left", "__val", "__tb")
      .withColumnRenamed("__asof", rightValue)
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
