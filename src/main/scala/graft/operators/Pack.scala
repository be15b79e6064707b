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
    require(budget > 0)
    withGlobalOffset(df, idCol, countCol, nBuckets)
      .withColumn("shard", expr(s"__off DIV $budget"))
      .drop("__off")
  }

  /** df + `__off`: each row's EXCLUSIVE prefix sum of `countCol` in
    * `idCol` order — the two-level decomposition documented on the
    * object, shared by [[packByBudget]] and [[packSequences]]. */
  private[operators] def withGlobalOffset(df: DataFrame, idCol: String,
      countCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0)
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
    // ANY null id — mixed or all-null — has no defined place in the
    // packing order: fail with the contract error, not a downstream
    // NPE (mixed) or silently overlapping offsets (all-null, which
    // would collapse every document to __off = 0 and interleave
    // packSequences output). Only genuinely EMPTY input passes through.
    require(bounds.getLong(2) == 0L,
      s"pack: id column '$idCol' has ${bounds.getLong(2)} null " +
        "rows; null ids have no position in the packing order")
    if (bounds.isNullAt(0)) { // empty input
      return src.withColumn("__off", lit(0L))
    }
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
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
    val offDf = offsets.toDF("__bkt", "__bkoff")
    val localPrefix = sum(col(countCol)).over(
      Window.partitionBy("__bkt").orderBy(col(idCol).asc)
        .rowsBetween(Window.unboundedPreceding, -1))
    src.withColumn("__bkt", bucket)
      .join(broadcast(offDf), Seq("__bkt"))
      .withColumn("__off",
        coalesce(localPrefix, lit(0L)) + col("__bkoff"))
      .drop("__bkt", "__bkoff")
  }

  /** Pack per-document token-id arrays into FIXED-LENGTH training
    * sequences — the terminal "emit training rows" step: documents
    * concatenate in `idCol` order into one global token stream, which
    * splits every `seqLen` tokens. Output:
    * (seq_id, n_tokens, token_ids), every sequence exactly `seqLen`
    * tokens except the last.
    *
    * Scale shape: a document's global token OFFSET comes from the same
    * two-level prefix sum as [[packByBudget]] (never a one-task global
    * window); the document then row-locally SLICES itself into the
    * sequences it spans (a doc touches ceil(len/seqLen)+1 sequences),
    * and each sequence assembles its few pieces with one narrow
    * groupBy — max rows per task bounded by corpus/nBuckets, max
    * pieces per sequence bounded by the docs that overlap it. Empty
    * documents contribute nothing. */
  def packSequences(df: DataFrame, idCol: String, idsCol: String,
      seqLen: Int, nBuckets: Int = 1024): DataFrame =
    packPieces(df, idCol, idsCol, seqLen, nBuckets)
      .groupBy("seq_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("ids")))),
        p => p.getField("ids"))).as("token_ids"))
      .withColumn("n_tokens", size(col("token_ids")))
      .select("seq_id", "n_tokens", "token_ids")

  /** [[packSequences]] plus BOUNDARY metadata: `doc_spans`, the
    * per-sequence array of (doc_id, pos, len) structs sorted by
    * `pos`, saying which document occupies which token range of the
    * packed sequence. This is the ingredient sequence packing owes
    * the training side — position-id resets and block-diagonal
    * ("document-masked") attention both need to know where documents
    * begin inside a packed row, and deriving it after the fact means
    * re-running the whole offset computation. Same plan shape as
    * [[packSequences]] (the spans ARE the pieces the packer already
    * routes — one extra projection in the final agg, no new
    * shuffle). */
  def packSequencesWithSpans(df: DataFrame, idCol: String,
      idsCol: String, seqLen: Int, nBuckets: Int = 1024): DataFrame =
    packPieces(df, idCol, idsCol, seqLen, nBuckets)
      .groupBy("seq_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("__doc"),
        col("ids")))).as("__ps"))
      .select(col("seq_id"),
        flatten(transform(col("__ps"), p => p.getField("ids")))
          .as("token_ids"),
        transform(col("__ps"), p => struct(
          p.getField("__doc").as("doc_id"),
          p.getField("pos").as("pos"),
          size(p.getField("ids")).as("len"))).as("doc_spans"))
      .withColumn("n_tokens", size(col("token_ids")))
      .select("seq_id", "n_tokens", "token_ids", "doc_spans")

  /** Shared slicing core of the sequence packers: each document
    * (with its two-level-prefix-sum global offset) row-locally
    * slices itself into the fixed-length sequences it spans —
    * (seq_id, pos, __doc, ids) piece rows, one narrow groupBy away
    * from assembled sequences. */
  private def packPieces(df: DataFrame, idCol: String, idsCol: String,
      seqLen: Int, nBuckets: Int): DataFrame = {
    require(seqLen > 0)
    val withOff = withGlobalOffset(
      df.select(col(idCol), col(idsCol))
        // a NULL token array counts as an empty document: bare
        // size(null) is -1 under legacy sizeOfNull, which would feed
        // -1 into the bucket totals/prefix sums (shifting every later
        // document's offset) while filter(__n > 0) drops the row
        .withColumn("__n", when(col(idsCol).isNull, 0L)
          .otherwise(size(col(idsCol)).cast("long"))),
      idCol, "__n", nBuckets)
    withOff
      .filter(col("__n") > 0)
      .withColumn("__piece", explode(transform(
        sequence(expr(s"__off DIV $seqLen"),
          expr(s"(__off + __n - 1) DIV $seqLen")),
        s => {
          // this doc's slice landing in sequence s: global positions
          // [max(s·L, off), min((s+1)·L, off+n) )
          val from = greatest(s * seqLen, col("__off"))
          val until = least((s + lit(1)) * seqLen,
            col("__off") + col("__n"))
          struct(
            s.cast("long").as("seq_id"),
            (from % seqLen).cast("int").as("pos"),
            col(idCol).as("__doc"),
            slice(col(idsCol), (from - col("__off") + 1).cast("int"),
              (until - from).cast("int")).as("ids"))
        })))
      .select(col("__piece.seq_id"), col("__piece.pos"),
        col("__piece.__doc").as("__doc"), col("__piece.ids"))
  }
}
