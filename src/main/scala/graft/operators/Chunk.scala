package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking — boundary positions derive from the
  * CONTENT (hash of the trailing `window` characters ≡ 0 mod
  * `modulus`), not from fixed offsets, so an insertion early in a
  * document shifts only the chunk it lands in and re-synchronizes at
  * the next content boundary. That is what makes chunk-level dedup
  * robust to edits: fixed-size blocks would misalign every block after
  * the edit; content-defined blocks keep all downstream chunks
  * byte-identical (the rsync/LBFS recipe, and how corpus pipelines
  * dedup boilerplate fragments embedded in otherwise-distinct pages).
  *
  * Everything is row-local built-in HOFs over the text column — no
  * UDF, no shuffle until the caller aggregates chunks. The boundary
  * hash here is md5-of-window (exact, engine-portable — the t45 gate
  * mirrors it literally in DuckDB); a production variant swaps in the
  * O(1)-per-position Rabin fingerprint behind the same boundary
  * predicate ([[graft.functions.TextOps.rollingHash]] is that
  * recurrence) once profiling says the window hash dominates.
  *
  * HOF rule (see TextOps.ngramsRaw): lambdas reference only their
  * element argument and plain column attributes — `substring(text, ...)`
  * per element is O(window), never a re-evaluated expression tree.
  */
object Chunk {

  /** Boundary predicate: md5 of the `w`-char window ending at 1-based
    * position `i`, folded to a long, ≡ 0 mod `modulus`. This is the
    * HOF REFERENCE FORM of [[graft.expressions.Md5Bounds]] — kept so
    * ChunkSpec can pin position-for-position equality between the two
    * (the r12-optimization contract: the native kernel changed the
    * cost per position, never a boundary). */
  private[graft] def isBoundary(text: Column, i: Column, w: Int,
      modulus: Int): Column =
    conv(substring(md5(substring(text, i - (w - 1), lit(w))), 1, 8),
      16, 10).cast("long") % modulus === 0

  /** [[contentDefinedChunks]]'s boundary array in the original HOF
    * form — spec-pinned against the native kernel. */
  private[graft] def md5BoundsHof(textCol: String, window: Int,
      modulus: Int): Column = {
    val text = col(textCol)
    val len = length(text)
    when(len > window,
      filter(sequence(lit(window), len - 1),
        i => isBoundary(text, i, window, modulus)))
      .otherwise(array().cast("array<int>"))
  }

  /** Split each document into content-defined chunks:
    * (idCol, chunk_idx, chunk) with chunk_idx from 0 in document
    * order; concat of chunks re-assembles the text exactly. Documents
    * shorter than `window` (including empty) are one whole-text chunk;
    * zero-length texts yield no rows. Expected chunk length ≈
    * `modulus` characters.
    *
    * Boundary END positions are i in [window, len-1] with the window
    * hash ≡ 0 — a boundary AT len would only split off an empty tail.
    * Since r12 the md5-window predicate runs as the codegen'd
    * [[graft.expressions.Md5Bounds]] kernel (digest over the byte
    * slice, no hex round-trip, no per-position interpreted lambda);
    * positions are bit-identical to [[md5BoundsHof]] (ChunkSpec pins
    * it) and the t45 oracle replays them unchanged. */
  def contentDefinedChunks(df: DataFrame, idCol: String, textCol: String,
      window: Int = 8, modulus: Int = 64): DataFrame = {
    require(window >= 1 && modulus >= 1)
    val bnds = org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.Md5Bounds(
        org.apache.spark.sql.GraftColumnBridge.expression(col(textCol)),
        window, modulus))
    sliceByBounds(df, idCol, textCol, bnds)
  }

  /** [[contentDefinedChunks]] with the O(1)-per-position Rabin window
    * fingerprint ([[graft.expressions.RollingBounds]], codegen'd) as
    * the boundary predicate — same contract, different (cheaper) hash,
    * so boundary POSITIONS differ from the md5 variant but every
    * property (lossless reassembly, edit re-sync, expected chunk
    * length ≈ modulus) is identical. This is the variant a 100-TB
    * corpus pass runs: the md5 predicate pays a digest per position,
    * this pays one multiply-add. */
  def contentDefinedChunksRolling(df: DataFrame, idCol: String,
      textCol: String, window: Int = 8, modulus: Int = 64): DataFrame = {
    require(window >= 1 && modulus >= 1)
    val bnds = org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.RollingBounds(
        org.apache.spark.sql.GraftColumnBridge.expression(col(textCol)),
        window, modulus))
    sliceByBounds(df, idCol, textCol, bnds)
  }

  /** Slice text into chunks delimited by boundary END positions
    * (shared by both predicates): chunk k spans
    * (bounds(k-1), bounds(k)], with 1 and len as outer sentinels. */
  private def sliceByBounds(df: DataFrame, idCol: String,
      textCol: String, bnds: Column): DataFrame = {
    val text = col(textCol)
    val len = length(text)
    val starts = concat(array(lit(1)), transform(bnds, b => b + 1))
    val ends = concat(bnds, array(len))
    df.filter(len > 0)
      .withColumn("__chunks", zip_with(starts, ends,
        (s, e) => substring(text, s, e - s + 1)))
      .select(col(idCol), posexplode(col("__chunks"))
        .as(Seq("chunk_idx", "chunk")))
  }

  /** Chunk-level duplication statistics per document — the
    * boilerplate-fragment signal document-level dedup misses:
    * (idCol, n_chunks, n_dup_chunks, dup_ratio) where a chunk is
    * duplicated iff its exact text occurs at more than one position
    * corpus-wide. Same aggregate shape as
    * [[SpanStats.duplicatedNgramStats]]: chunk instances collapse to
    * (doc, chunk-hash) multiplicities before anything shuffles. */
  /** FIXED token windows with overlap — the RAG/context-window
    * chunker (the positional complement of the content-defined
    * chunks above: a retrieval index wants uniform windows; a dedup
    * pass wants boundaries that survive edits). Chunk k covers
    * tokens [k·stride, k·stride + size); windows start while
    * k·stride < n_tokens, so the tail emits as a short final chunk
    * (never dropped, never padded) and `stride < size` yields the
    * usual overlapping windows. Entirely row-local — a sequence
    * expression over the token array, no shuffle, no window
    * function; chunk ordinals are per-document, not global.
    *
    * Output: (idCol, chunk_id, chunk_text, n_tokens). Docs with NULL
    * or empty-string text emit nothing (split("") returns [""] — one
    * phantom empty token — so emptiness needs its own guard; count
    * such docs upstream if they matter). Whitespace-only text splits
    * to empty-string tokens, the same split semantics every token op
    * here uses. */
  def tokenWindows(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size >= 1, s"size must be >= 1, got $size")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val toks = split(col(textCol), " ")
    val n = org.apache.spark.sql.functions.size(toks)
    val chunks = transform(
      sequence(lit(0), greatest(ceil(n.cast("double") / stride)
        .cast("int") - 1, lit(0))),
      k => struct(k.cast("long").as("chunk_id"),
        array_join(slice(toks, k * stride + 1, lit(size)), " ")
          .as("chunk_text"),
        least(n - k * stride, lit(size)).cast("long").as("n_tokens")))
    df.filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol), explode(chunks).as("__c"))
      .select(col(idCol), col("__c.chunk_id"), col("__c.chunk_text"),
        col("__c.n_tokens"))
  }

  def chunkDupStats(df: DataFrame, idCol: String, textCol: String,
      window: Int = 8, modulus: Int = 64,
      rolling: Boolean = false): DataFrame = {
    // the stats are hash-agnostic; `rolling = true` uses the Rabin
    // predicate — measured 17× cheaper at sf0.1 (t47 0.3 s vs t45
    // 5.1 s), the right default at scale (the gate pins the md5 form)
    val chunks =
      if (rolling)
        contentDefinedChunksRolling(df, idCol, textCol, window, modulus)
      else contentDefinedChunks(df, idCol, textCol, window, modulus)
    val local = chunks
      .select(col(idCol), md5(col("chunk")).as("__h"))
      .groupBy(col(idCol), col("__h"))
      .agg(count(lit(1)).as("c_local"))
    val global = local.groupBy("__h")
      .agg(sum("c_local").as("c_glob"))
    local.join(global, Seq("__h"))
      .groupBy(col(idCol))
      .agg(
        sum("c_local").as("n_chunks"),
        sum(when(col("c_glob") > 1, col("c_local")).otherwise(lit(0L)))
          .as("n_dup_chunks"))
      .withColumn("dup_ratio",
        round(col("n_dup_chunks") / col("n_chunks"), 6))
  }
}
