package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — the shard-assignment step of a
  * training-data pipeline: documents fill fixed-budget training shards
  * in deterministic id order (shard = exclusive-prefix-tokens DIV
  * budget, "contiguous fill": a document straddling a boundary starts
  * its tokens in the earlier shard, so shard width is ≤ budget + one
  * document).
  *
  * The naive expression — a running sum over `ORDER BY id` with no
  * partition — is the classic scale trap: Spark executes an
  * unpartitioned window on ONE task, so the whole corpus funnels
  * through a single core. This operator computes the same prefix sum
  * in two levels instead:
  *
  *   1. rows bucket by id RANGE (order-preserving: every id in bucket
  *      b sorts before every id in bucket b+1);
  *   2. per-bucket token totals — one narrow groupBy, `nBuckets` rows
  *      — collect to the driver, which prefix-sums them into
  *      per-bucket offsets (exact integer arithmetic);
  *   3. a window WITHIN each bucket (parallel across buckets) adds the
  *      bucket-local exclusive prefix to the broadcast offset.
  *
  * Identical output to the single-partition window at any
  * partitioning, with max task size corpus/nBuckets. Value-range
  * bucketing keeps buckets contiguous for ANY id distribution; heavily
  * skewed ids just imbalance bucket sizes (raise nBuckets — each extra
  * bucket costs one 16-byte driver row).
  */
object Pack {

  private val IntegralIdTypes: Set[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    Set(ByteType, ShortType, IntegerType, LongType)
  }

  /** Assign each row a `shard` id: exclusive-prefix-sum of
    * `countCol` in `idCol` order, DIV `budget`. Adds nothing else;
    * row count and columns are otherwise preserved. */
  def packByBudget(df: DataFrame, idCol: String, countCol: String,
      budget: Long, nBuckets: Int = 1024): DataFrame = {
    require(budget > 0 && nBuckets > 0)
    // id must be integral: a numeric-STRING id would bucket by numeric
    // cast but window-order lexicographically ("10" < "9"), silently
    // diverging from the single-window prefix sum
    require(IntegralIdTypes.contains(df.schema(idCol).dataType),
      s"packByBudget: id column '$idCol' must be an integral type, " +
        s"got ${df.schema(idCol).dataType}")
    // the operator runs two driver aggregates (bounds, bucket totals)
    // plus the consumer's action over the same input plan — persist it
    // so an expensive upstream (curateToShards runs the whole curation
    // pipeline here) computes once, not three times. Registered with
    // CacheRegistry: long-lived sessions release via
    // CacheRegistry.release() (Bench does, per rep).
    val src = graft.CacheRegistry.track(df.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val bounds = src.agg(min(col(idCol)).cast("long"),
      max(col(idCol)).cast("long"),
      count(lit(1)) - count(col(idCol))).collect()(0)
    if (bounds.isNullAt(0)) { // empty input (or all-null ids)
      return src.withColumn("shard", lit(0L))
    }
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // a MIX of null and non-null ids has no defined place in the id
    // order — fail with the contract error, not a downstream NPE
    require(bounds.getLong(2) == 0L,
      s"packByBudget: id column '$idCol' has ${bounds.getLong(2)} null " +
        "rows; null ids have no position in the packing order")
    // bucket = (id - lo) DIV ceil(span / nBuckets): contiguous id
    // ranges, <= nBuckets buckets. Ids spanning more than the long
    // range (lo deeply negative, hi huge) would wrap hi-lo+1 negative
    // and collapse width to 1 — reject that loudly instead
    val span =
      try math.max(Math.addExact(Math.subtractExact(hi, lo), 1L), 1L)
      catch { case _: ArithmeticException =>
        throw new IllegalArgumentException(
          s"packByBudget: id range [$lo, $hi] exceeds the long span; " +
            "re-key ids into a narrower range first")
      }
    // ceil-div written overflow-free ((span-1)/n + 1, span >= 1)
    val width = math.max((span - 1) / nBuckets + 1, 1L)
    val bucket: Column = // integer DIV: exact and monotone at any id
      expr(s"(CAST(`$idCol` AS BIGINT) - ${lo}L) DIV ${width}L")
    // all-null countCol buckets sum to NULL — treat as 0 contribution
    // (matches the window side, where sum-over-nulls coalesces to 0)
    val totals = src.groupBy(bucket.as("__bkt"))
      .agg(coalesce(sum(col(countCol)).cast("long"), lit(0L)).as("__tot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      .toSeq
    val offsets = totals.scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (b, tot)) => (b, acc + tot)
    }.sliding(2).map { case Seq((_, off), (b, _)) => (b, off) }.toSeq
    val spark = src.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__bkt", "__off")
    val localPrefix = sum(col(countCol)).over(
      Window.partitionBy("__bkt").orderBy(col(idCol).asc)
        .rowsBetween(Window.unboundedPreceding, -1))
    src.withColumn("__bkt", bucket)
      .join(broadcast(offDf), Seq("__bkt"))
      .withColumn("__pfx", coalesce(localPrefix, lit(0L)) + col("__off"))
      .withColumn("shard", expr(s"__pfx DIV $budget"))
      .drop("__bkt", "__off", "__pfx")
  }
}
