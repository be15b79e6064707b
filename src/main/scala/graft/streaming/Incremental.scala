package graft.streaming

import graft.operators.{Ann, MergeOps, NearDup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.storage.StorageLevel

/** Structured-Streaming re-expression of the reference's incremental
  * batch contract (SURVEY.md §2.9): watermark/cursor extraction with
  * overlap, at-least-once delivery, keyed-upsert idempotency.
  *
  * Bronze files are the stream source; `Trigger.AvailableNow` drains
  * whatever is present and stops — the exact semantics of "next run
  * catches up everything since the watermark" (OPERATIONS_GUIDE.md:
  * 86-94), with the checkpoint replacing the watermark doc. Each
  * micro-batch MERGEs by business key, so late/duplicate records
  * overwrite older versions instead of duplicating — the same
  * invariant the reference's ON CONFLICT upsert provides.
  */
object Incremental {

  /** Replay-safe write of a corpus-builder stream's per-batch index
    * leaf (`<dirPath>/batch=<batchId>`): overwrite — EXCEPT when the
    * recomputed `survivors` frame is EMPTY and the leaf already
    * exists, in which case the write is SKIPPED.
    *
    * Why: foreachBatch is at-least-once, and the crash window "leaf
    * written AND corpus appended, checkpoint commit lost" replays the
    * batch with a `fresh` frame that the anti-join against the
    * already-appended corpus has EMPTIED. Overwriting the leaf with
    * that empty frame would permanently DELETE the accepted docs'
    * index rows while the corpus keeps the docs — every future batch
    * then misses duplicates against them (destructive, unlike the
    * other window — leaf written, corpus lost — where the replay
    * recomputes the same survivors and the overwrite is idempotent).
    *
    * The skip can never suppress a legitimate write: leaf paths are
    * written by their own batchId alone, so "leaf exists" implies
    * this exact batch ran before, and a genuinely-empty first run
    * writes an empty leaf only when none exists (re-skipping its
    * replay is then a no-op on an already-empty leaf). The emptiness
    * probe touches the already-persisted survivors frame (a limit-1
    * action), and only on the replay path — a normal batch sees no
    * leaf and writes immediately. Residual window, documented: a
    * TORN corpus append (partial task files, no commit) replaying
    * with a non-empty survivor SUBSET still narrows the leaf — torn
    * parquet appends are the failure class the CommitLog table
    * format's atomic commit exists for; these streams assume the
    * corpus append is atomic-or-absent.
    *
    * CHECKPOINT/ASSET COUPLING (operational contract): "leaf exists
    * implies this exact batch ran before" holds only while the
    * checkpoint directory and the asset directories (corpus, index,
    * bands, df) live and die TOGETHER. Deleting the checkpoint while
    * keeping the assets restarts batch ids at 0: new batches collide
    * with old leaves, and an early batch whose survivors are
    * legitimately empty would skip its write and retain a STALE leaf
    * whose doc ids may no longer exist in the new corpus — ghost
    * index rows that silently drop future genuine documents (the
    * self-pair guard only protects a doc against its own ghost).
    * Reset all of the stream's directories as one unit, or none. */
  private def writeLeafReplaySafe(rows: DataFrame, dirPath: String,
      batchId: Long, survivors: DataFrame): Unit = {
    val leaf = s"$dirPath/batch=$batchId"
    val hPath = new org.apache.hadoop.fs.Path(leaf)
    val fs = hPath.getFileSystem(
      survivors.sparkSession.sparkContext.hadoopConfiguration)
    if (!(fs.exists(hPath) && survivors.isEmpty))
      rows.write.mode("overwrite").parquet(leaf)
  }

  /** Stream bronze JSONL text into a silver parquet table with keyed
    * upsert per micro-batch. Returns after draining (AvailableNow).
    *
    * `versionExpr` (optional SQL over `raw_data`) supplies a
    * content-derived ordering — e.g. an ISO updated_at field, which
    * sorts lexicographically — so within-batch duplicates resolve by
    * record recency, not file-listing order. Batch id + row sequence
    * remain as the final tie-break either way (total order). */
  def bronzeToSilver(spark: SparkSession, bronzeGlob: String,
      silverPath: String, checkpoint: String,
      keyExpr: String, versionExpr: Option[String] = None): Unit = {
    val stream = spark.readStream
      .format("text")
      .load(bronzeGlob)
      .withColumnRenamed("value", "raw_data")
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // version must be totally ordered: batch id orders across
        // drains, the per-row sequence breaks ties WITHIN a batch
        // (current_timestamp alone is one constant per batch, which
        // would make duplicate keys collapse nondeterministically)
        // versionExpr component normalized to FIXED width: a variable-
        // length prefix breaks lexicographic keep-latest ("9|..." >
        // "10|..." for numeric epochs). lpad with space (sorts before
        // any digit/letter) handles numerics correctly and leaves
        // equal-length ISO-8601 strings unchanged; values longer than
        // the width would be silently truncated by lpad, so they fail
        // loudly instead. A null version pads to all-spaces and loses
        // to any real version — deterministic, documented.
        // The leading '~' (0x7E, above every digit/letter/space) is a
        // FORMAT EPOCH: rows written by the pre-padding format start
        // with a digit or letter, so every new-format version compares
        // greater and an upgraded table keeps converging forward
        // instead of stale old-format rows winning merges forever.
        val versionWidth = 32
        val versionCol = versionExpr.map { e =>
          val v = expr(e).cast("string")
          when(length(v) > versionWidth, raise_error(concat(
            lit(s"versionExpr value exceeds $versionWidth chars: "), v)))
            .otherwise(concat(lit("~"),
              lpad(coalesce(v, lit("")), versionWidth, " ")))
        }.getOrElse(lit("~"))
        val keyed = batch
          .withColumn("natural_key", expr(keyExpr))
          .filter(col("natural_key").isNotNull)
          .withColumn("_loaded_at", current_timestamp())
          .withColumn("_updated_at", current_timestamp())
          .withColumn("_batch_id", lit(batchId))
          .withColumn("_version", concat(
            versionCol,
            lit("|"),
            lpad(lit(batchId).cast("string"), 12, "0"),
            lpad(monotonically_increasing_id().cast("string"), 20, "0")))
        MergeOps.upsert(batch.sparkSession, keyed, silverPath,
          Seq("natural_key"), "_version",
          preserveOnUpdate = Seq("_loaded_at"))
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming near-dup corpus builder — the incremental MinHash dedup
    * ([[NearDup.dedupByMinhashIncremental]]) composed with the bronze
    * drain: each micro-batch is deduped against itself AND the
    * materialized band index of every document ever accepted, then
    * survivors are appended to the corpus table and their banded
    * signatures to the band table. Per-batch cost is ∝ batch (the
    * existing side is semi-join pruned to touched buckets), never
    * ∝ corpus — the property that lets this run forever at 100 TB.
    *
    * Two AvailableNow drains produce the same corpus as one batch
    * dedup of the union when ids arrive in increasing order — the
    * daily-append pattern (earlier-drain documents win uncondition-
    * ally; the batch operator's min-id policy agrees exactly when
    * earlier means smaller). Spec-pinned.
    *
    * At-least-once safety: replayed ids are dropped against the
    * accepted corpus before dedup, so a crash-replay cannot duplicate
    * corpus rows. Bands land BEFORE corpus rows, and land
    * IDEMPOTENTLY — each micro-batch overwrites its own
    * `batch=<batchId>` leaf of the band table, so a crash-replay
    * rewrites the same rows instead of appending duplicates.
    * (Duplicated band rows would not be "harmless": they inflate the
    * per-bucket count the hot-bucket guard reads, and past `maxBucket`
    * the guard silently hub-collapses real candidates — recall loss,
    * compounding on every replay.) The band-crash window that remains
    * is benign: bands written, corpus append lost → replay recomputes
    * the same survivors (the phantom band rows have no corpus doc, so
    * the verify's inner join against corpus text drops them) and
    * overwrites the same leaf. */
  def neardupStream(spark: SparkSession, bronzeGlob: String,
      corpusPath: String, bandsPath: String, checkpoint: String,
      idExpr: String, textExpr: String, threshold: Double = 0.8,
      k: Int = 12, bands: Int = 4, maxBucket: Int = 1024): Unit =
    neardupStreamImpl(spark, bronzeGlob, corpusPath, bandsPath,
      checkpoint, idExpr, textExpr, threshold, k, bands, maxBucket,
      identity)

  /** Streaming CURATE corpus builder: [[neardupStream]] with
    * `Curate`'s row-local quality + language gates applied to each
    * micro-batch BEFORE the incremental near-dup — the streaming form
    * of `Curate.curate`. The gates are pure projections, so they prune
    * the batch before anything shuffles or touches the band index;
    * exact cross-batch duplicates need no separate fingerprint store
    * (an exact dup is a Jaccard-1 near-dup, caught by the band index
    * at any threshold ≤ 1). Same idempotent `batch=<id>` band-leaf
    * crash-replay contract as [[neardupStream]]. */
  def curateStream(spark: SparkSession, bronzeGlob: String,
      corpusPath: String, bandsPath: String, checkpoint: String,
      idExpr: String, textExpr: String, minTokens: Int = 20,
      maxTokens: Int = 100000, maxStopRatio: Double = 0.15,
      threshold: Double = 0.8, k: Int = 12, bands: Int = 4,
      maxBucket: Int = 1024): Unit =
    neardupStreamImpl(spark, bronzeGlob, corpusPath, bandsPath,
      checkpoint, idExpr, textExpr, threshold, k, bands, maxBucket,
      batch => graft.operators.Curate.rowLocalGates(batch, "text",
        minTokens, maxTokens, maxStopRatio))

  private def neardupStreamImpl(spark: SparkSession, bronzeGlob: String,
      corpusPath: String, bandsPath: String, checkpoint: String,
      idExpr: String, textExpr: String, threshold: Double,
      k: Int, bands: Int, maxBucket: Int,
      prep: DataFrame => DataFrame): Unit = {
    val stream = spark.readStream
      .format("text")
      .load(bronzeGlob)
      .withColumnRenamed("value", "raw_data")
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        val incoming = prep(batch
          .withColumn("doc_id", expr(idExpr))
          .withColumn("text", expr(textExpr))
          .filter(col("doc_id").isNotNull && col("text").isNotNull)
          .select("doc_id", "text")
          .dropDuplicates("doc_id"))
        val exDocs = MergeOps.readIfExists(ss, corpusPath)
          .getOrElse(incoming.limit(0))
        val exBands = MergeOps.readIfExists(ss, bandsPath)
          .getOrElse(NearDup.minhashBands(incoming.limit(0), "doc_id",
            "text", k, bands))
        val fresh = incoming.join(exDocs.select("doc_id"),
          Seq("doc_id"), "left_anti")
        val survivors = NearDup.dedupByMinhashIncremental(fresh,
          "doc_id", "text", exBands, exDocs, threshold, k, bands,
          maxBucket).persist(StorageLevel.MEMORY_AND_DISK)
        try {
          // overwrite THIS batch's leaf (not append): replaying the
          // same batchId after a crash rewrites identical band rows
          // instead of duplicating them — partition discovery on read
          // adds a `batch` column downstream code never selects.
          // Replay of a FULLY committed batch (survivors emptied by
          // the corpus anti-join) skips the write instead of wiping
          // the leaf — see writeLeafReplaySafe.
          writeLeafReplaySafe(
            NearDup.minhashBands(survivors, "doc_id", "text", k, bands),
            bandsPath, batchId, survivors)
          survivors.write.mode("append").parquet(corpusPath)
        } finally {
          survivors.unpersist(blocking = false)
          // drain operator-tracked per-batch caches (the Bench/Verify
          // inter-query discipline): the dedup operators register
          // their batch-bounded persists with CacheRegistry; a
          // streaming driver that never releases accumulates one set
          // per micro-batch for the life of the query
          graft.CacheRegistry.release()
        }
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming embedding-dedup corpus builder — the embedding twin of
    * [[neardupStream]]: each micro-batch of vectors is deduped against
    * itself AND the materialized SRP-LSH band index of every vector
    * ever accepted ([[NearDup.dedupByEmbeddingIncremental]]), then
    * survivors append to the corpus table and their bands land
    * idempotently in this batch's `batch=<batchId>` leaf of the band
    * table (same crash-replay reasoning as [[neardupStream]]:
    * replayed batches rewrite, never duplicate). `vecExpr` is SQL over
    * `raw_data` producing an `array<double>`. */
  def embeddingDedupStream(spark: SparkSession, bronzeGlob: String,
      corpusPath: String, bandsPath: String, checkpoint: String,
      idExpr: String, vecExpr: String, threshold: Double, dims: Int,
      tables: Int = 4, planesPerTable: Int = 4,
      maxBucket: Int = 1024): Unit = {
    val stream = spark.readStream
      .format("text")
      .load(bronzeGlob)
      .withColumnRenamed("value", "raw_data")
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        val incoming = batch
          .withColumn("vec_id", expr(idExpr))
          .withColumn("vec", expr(vecExpr))
          .filter(col("vec_id").isNotNull && col("vec").isNotNull)
          .select("vec_id", "vec")
          .dropDuplicates("vec_id")
        val exVecs = MergeOps.readIfExists(ss, corpusPath)
          .getOrElse(incoming.limit(0))
        val exBands = MergeOps.readIfExists(ss, bandsPath)
          .getOrElse(NearDup.embeddingBands(incoming.limit(0), "vec_id",
            "vec", dims, tables, planesPerTable))
        val fresh = incoming.join(exVecs.select("vec_id"),
          Seq("vec_id"), "left_anti")
        val survivors = NearDup.dedupByEmbeddingIncremental(fresh,
          "vec_id", "vec", exBands, exVecs, threshold, dims, tables,
          planesPerTable, maxBucket).persist(StorageLevel.MEMORY_AND_DISK)
        try {
          writeLeafReplaySafe(
            NearDup.embeddingBands(survivors, "vec_id", "vec", dims,
              tables, planesPerTable),
            bandsPath, batchId, survivors)
          survivors.write.mode("append").parquet(corpusPath)
        } finally {
          survivors.unpersist(blocking = false)
          // drain operator-tracked per-batch caches (the Bench/Verify
          // inter-query discipline): the dedup operators register
          // their batch-bounded persists with CacheRegistry; a
          // streaming driver that never releases accumulates one set
          // per micro-batch for the life of the query
          graft.CacheRegistry.release()
        }
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming SIGNATURE-dedup corpus builder — the media twin of
    * [[neardupStream]] for precomputed 64-bit perceptual signatures
    * (image dHash via `ImageOps.dHash`, audio fingerprints via
    * `AudioOps.audioFingerprint`): each micro-batch of (id, signature)
    * rows dedups against itself AND the materialized paired-block band
    * index of every signature ever accepted
    * ([[NearDup.dedupBySignatureIncremental]]), then survivors append
    * to the corpus table and their bands land idempotently in this
    * batch's `batch=<batchId>` leaf (same crash-replay reasoning as
    * [[neardupStream]]: replayed batches rewrite, never duplicate —
    * and band rows carry the full signature, so the existing side
    * never re-reads media bytes). `sigExpr` is SQL over `raw_data`
    * producing the BIGINT signature. */
  def signatureDedupStream(spark: SparkSession, bronzeGlob: String,
      corpusPath: String, bandsPath: String, checkpoint: String,
      idExpr: String, sigExpr: String, maxHamming: Int = 3,
      maxBucket: Int = 1024): Unit = {
    val stream = spark.readStream
      .format("text")
      .load(bronzeGlob)
      .withColumnRenamed("value", "raw_data")
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        val incoming = batch
          .withColumn("doc_id", expr(idExpr))
          .withColumn("sig", expr(sigExpr))
          .filter(col("doc_id").isNotNull && col("sig").isNotNull)
          .select("doc_id", "sig")
          .dropDuplicates("doc_id")
        val exCorpus = MergeOps.readIfExists(ss, corpusPath)
          .getOrElse(incoming.limit(0))
        val exBands = MergeOps.readIfExists(ss, bandsPath)
          .getOrElse(NearDup.signatureBands(incoming.limit(0), "doc_id",
            "sig", maxHamming))
        val fresh = incoming.join(exCorpus.select("doc_id"),
          Seq("doc_id"), "left_anti")
        val survivors = NearDup.dedupBySignatureIncremental(fresh,
          "doc_id", "sig", exBands, maxHamming, maxBucket)
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          writeLeafReplaySafe(
            NearDup.signatureBands(survivors, "doc_id", "sig",
              maxHamming),
            bandsPath, batchId, survivors)
          survivors.write.mode("append").parquet(corpusPath)
        } finally {
          survivors.unpersist(blocking = false)
          // drain operator-tracked per-batch caches (the Bench/Verify
          // inter-query discipline): the dedup operators register
          // their batch-bounded persists with CacheRegistry; a
          // streaming driver that never releases accumulates one set
          // per micro-batch for the life of the query
          graft.CacheRegistry.release()
        }
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming CONTAINMENT-dedup corpus builder — the directional
    * (excerpt⊂source) twin of [[neardupStream]]: each micro-batch
    * dedups against itself AND the materialized inverted gram index
    * of every document ever accepted
    * ([[NearDup.dedupByContainmentIncremental]]); survivors append to
    * the corpus and their gram rows land idempotently in this batch's
    * `batch=<batchId>` index leaf. Crash-replay covers BOTH windows:
    * index-written-corpus-lost replays heal because the gram index is
    * SELF-DESCRIBING (rows carry grams + sizes, no corpus-text join
    * to drop phantoms) and the operator's __inid =!= __exid guard
    * stops each doc from self-matching its own ghost rows at cont=1
    * (spec-pinned); both-written-commit-lost replays (survivors
    * emptied by the corpus anti-join) SKIP the leaf overwrite instead
    * of wiping the accepted docs' gram rows
    * ([[writeLeafReplaySafe]], spec-pinned). `maxDf`
    * passes through to the hot-gram guard.
    *
    * `dfPath` (optional) switches the history-side cap to the
    * PRODUCTION path ([[NearDup.dedupByContainmentIncrementalWithDf]]):
    * the stream maintains a (gram, df) side asset as per-batch
    * increment leaves — same `batch=<id>` replay contract — and the
    * cap reads the narrow pre-aggregated asset instead of scanning
    * the corpus-sized gram index twice per batch. Compact the leaves
    * with the table-maintenance pass when their count grows. */
  def containmentStream(spark: SparkSession, bronzeGlob: String,
      corpusPath: String, indexPath: String, checkpoint: String,
      idExpr: String, textExpr: String, tau: Double,
      maxDf: Int = NearDup.ContainmentMaxDfDefault,
      dfPath: Option[String] = None): Unit = {
    val stream = spark.readStream
      .format("text")
      .load(bronzeGlob)
      .withColumnRenamed("value", "raw_data")
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        val incoming = batch
          .withColumn("doc_id", expr(idExpr))
          .withColumn("text", expr(textExpr))
          .filter(col("doc_id").isNotNull && col("text").isNotNull)
          .select("doc_id", "text")
          .dropDuplicates("doc_id")
        val exDocs = MergeOps.readIfExists(ss, corpusPath)
          .getOrElse(incoming.limit(0))
        // partition discovery adds a `batch` column — project it away
        // so the index frame matches containmentGramIndex's schema
        val exIndex = MergeOps.readIfExists(ss, indexPath)
          .map(_.select("doc_id", "gram", "n_grams"))
          .getOrElse(NearDup.containmentGramIndex(
            incoming.limit(0), "doc_id", "text"))
        val fresh = incoming.join(exDocs.select("doc_id"),
          Seq("doc_id"), "left_anti")
        val survivors = dfPath match {
          case Some(dp) =>
            // PRODUCTION cap path: the (gram, df) side asset lives as
            // per-batch increment leaves (batch=<id>, same replay
            // contract as the index); its read is leaves → sum, a
            // pre-aggregated frame FAR narrower than the (doc, gram)
            // index the base path would scan twice. A MISSING asset
            // dir is seeded from the PERSISTED index under the
            // reserved leaf `batch=-1` (stream batch ids start at 0):
            // enabling dfPath on an existing stream — or losing just
            // the df dir — must still cap legacy history, and the
            // 'leaves sum to containmentGramDf(full index)' invariant
            // must hold from the first dfPath batch. The seed is
            // written BEFORE any other leaf of this batch, with
            // if-absent semantics, so every crash window replays
            // clean: before-seed → recompute from the same pre-batch
            // index listing; after-seed → the leaf pins history and
            // the re-listed index (which may now contain this batch's
            // own leaf) is never re-aggregated. On a genuinely fresh
            // stream the index is empty and the seed is an empty
            // schema-only leaf.
            if (MergeOps.readIfExists(ss, dp).isEmpty)
              NearDup.containmentGramDf(exIndex)
                .write.mode("ignore").parquet(s"$dp/batch=-1")
            val exDf = ss.read.parquet(dp)
              .select(col("gram.h1").as("h1"),
                col("gram.h2").as("h2"), col("df"))
              .groupBy("h1", "h2").agg(sum("df").as("df"))
              .select(struct(col("h1"), col("h2")).as("gram"),
                col("df"))
            val (s, _, _) = NearDup.dedupByContainmentIncrementalWithDf(
              fresh, "doc_id", "text", exIndex, exDf, tau, maxDf)
            s
          case None =>
            val (s, _) = NearDup.dedupByContainmentIncremental(
              fresh, "doc_id", "text", exIndex, tau, maxDf)
            s
        }
        val sp = survivors.persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val leafGrams = NearDup.containmentGramIndex(sp,
            "doc_id", "text").persist(StorageLevel.MEMORY_AND_DISK)
          try {
            writeLeafReplaySafe(leafGrams, indexPath, batchId, sp)
            // the df INCREMENT of this batch's accepted docs — the
            // asset's leaves sum to containmentGramDf(full index)
            // (spec-asserted)
            dfPath.foreach(dp => writeLeafReplaySafe(
              leafGrams.select(col("gram.h1").as("h1"),
                col("gram.h2").as("h2"))
                .groupBy("h1", "h2").agg(count(lit(1)).as("df"))
                .select(struct(col("h1"), col("h2")).as("gram"),
                  col("df")),
              dp, batchId, sp))
          } finally leafGrams.unpersist(blocking = false)
          sp.write.mode("append").parquet(corpusPath)
        } finally {
          sp.unpersist(blocking = false)
          // drain operator-tracked per-batch caches (the Bench/Verify
          // inter-query discipline): the dedup operators register
          // their batch-bounded persists with CacheRegistry; a
          // streaming driver that never releases accumulates one set
          // per micro-batch for the life of the query
          graft.CacheRegistry.release()
        }
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming SEMANTIC-cells dedup corpus builder — the SemDeDup
    * twin of [[embeddingDedupStream]]: each micro-batch of vectors
    * dedups against itself AND the materialized (id, vec, cell)
    * assignment index of every vector ever accepted
    * ([[NearDup.dedupBySemanticCellsIncremental]] against the shared
    * `centroidsPath` asset — cosine is priced only WITHIN a cell, and
    * assignments are computed once per vector, ever). Survivors
    * append to the corpus and their assignment rows land idempotently
    * in this batch's `batch=<batchId>` index leaf — the same
    * crash-replay contract as the band streams: index-written-
    * corpus-lost replays heal via the operator's __id2 =!= __xid
    * self-pair guard (a ghost assignment row would otherwise drop its
    * own doc at cosine 1), and both-written-commit-lost replays skip
    * the leaf overwrite ([[writeLeafReplaySafe]]). `vecExpr` is SQL
    * over `raw_data` producing an `array<double>`. */
  def semanticCellsStream(spark: SparkSession, bronzeGlob: String,
      corpusPath: String, indexPath: String, centroidsPath: String,
      checkpoint: String, idExpr: String, vecExpr: String,
      threshold: Double): Unit = {
    val stream = spark.readStream
      .format("text")
      .load(bronzeGlob)
      .withColumnRenamed("value", "raw_data")
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        val cents = ss.read.parquet(centroidsPath)
        val incoming = batch
          .withColumn("vec_id", expr(idExpr))
          .withColumn("vec", expr(vecExpr))
          .filter(col("vec_id").isNotNull && col("vec").isNotNull)
          .select("vec_id", "vec")
          .dropDuplicates("vec_id")
        val exCorpus = MergeOps.readIfExists(ss, corpusPath)
          .getOrElse(incoming.limit(0))
        // partition discovery adds a `batch` column — project it away
        // so the index frame matches ivfAssign's schema
        val exIndex = MergeOps.readIfExists(ss, indexPath)
          .map(_.select("vec_id", "vec", "cell"))
          .getOrElse(Ann.ivfAssign(incoming.limit(0), "vec_id", "vec",
            cents, "cent_id", "cv"))
        val fresh = incoming.join(exCorpus.select("vec_id"),
          Seq("vec_id"), "left_anti")
        val survivors = NearDup.dedupBySemanticCellsIncremental(fresh,
          "vec_id", "vec", exIndex, cents, "cent_id", "cv", threshold)
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          writeLeafReplaySafe(
            Ann.ivfAssign(survivors, "vec_id", "vec", cents,
              "cent_id", "cv"),
            indexPath, batchId, survivors)
          survivors.write.mode("append").parquet(corpusPath)
        } finally {
          survivors.unpersist(blocking = false)
          // drain operator-tracked per-batch caches (the Bench/Verify
          // inter-query discipline): the dedup operators register
          // their batch-bounded persists with CacheRegistry; a
          // streaming driver that never releases accumulates one set
          // per micro-batch for the life of the query
          graft.CacheRegistry.release()
        }
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming event-time dedup: exactly-one-row-per-key within the
    * watermark horizon — the streaming form of the D-family keep-first
    * (an at-least-once bronze replay must not duplicate silver).
    * State for a key is dropped once the watermark passes its event
    * time + `lateness`, so state size is bounded by the lateness
    * window, not the corpus — the property that makes this runnable
    * forever at 100 TB/day. First-seen wins; use [[bronzeToSilver]]'s
    * keyed upsert when latest-version-wins is required instead. */
  /** Stream a CDC changeset feed into a commit-log table: each
    * micro-batch applies through
    * [[graft.operators.CommitLogTableFormat.applyCdc]] — inserts,
    * updates, AND deletes, with the changeset-internal latest-wins
    * and the uniform stale-op rule. That rule is ALSO the crash
    * story: foreachBatch is at-least-once, and a replayed batch
    * re-applies as a pure no-op (every op is now stale against the
    * target), so the sink is effectively-once without any sink-side
    * batch-id bookkeeping. `autoOptimizeMaxFiles` bounds the
    * small-file debt the per-batch commits accrue: when the snapshot
    * exceeds it, one amortized bin-pack (optionally z-ordered) rewrite
    * runs inside the same drain.
    *
    * `changes` must be a STREAMING DataFrame carrying `keys`,
    * `opCol`, `versionCol`, and the payload columns; returns after
    * draining (AvailableNow, the §2.9 catch-up contract). */
  def cdcStream(changes: DataFrame, targetPath: String,
      keys: Seq[String], opCol: String, versionCol: String,
      checkpoint: String, deleteOp: String = "D",
      autoOptimizeMaxFiles: Option[Int] = None,
      zorderBy: Seq[String] = Nil,
      zorderStrategy: String = "width"): Unit = {
    val q = changes.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.operators.CommitLogTableFormat.applyCdc(
            batch.sparkSession, batch, targetPath, keys, opCol,
            versionCol, deleteOp)
          autoOptimizeMaxFiles.foreach(n =>
            graft.operators.CommitLogTableFormat.optimizeIfNeeded(
              batch.sparkSession, targetPath, maxFiles = n,
              zorderBy = zorderBy, zorderStrategy = zorderStrategy))
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Incremental JOIN-view maintenance under INSERT-ONLY deltas: the
    * new rows of V = L ⋈ R after batches ΔL, ΔR arrive are exactly
    *
    *   ΔV = ΔL⋈R ∪ L⋈ΔR ∪ ΔL⋈ΔR
    *
    * (L, R = the bases BEFORE the batch), so maintaining the view is
    * appending ΔV — three joins each carrying one delta side instead
    * of re-joining two full corpora: O(Δ) probe work per batch where
    * the naive refresh is O(|L|+|R|) every time. Deltas are
    * broadcast by default (`broadcastDeltas=false` for backfill-sized
    * batches — the joins then shuffle on the key like any big join).
    * `keys` are common column names: pre-rename one side (a view
    * defines its own join spelling once). Updates/deletes are NOT
    * expressible as ΔV appends — route those through [[cdcStream]] /
    * CommitLogTableFormat.applyCdc and refresh affected keys. The j9
    * gate proves batch-maintained state equals the full re-join;
    * IncrementalViewSpec chains multiple batches. */
  def joinViewDelta(baseL: DataFrame, deltaL: DataFrame,
      baseR: DataFrame, deltaR: DataFrame, keys: Seq[String],
      broadcastDeltas: Boolean = true): DataFrame = {
    val (dl, dr) =
      if (broadcastDeltas) (broadcast(deltaL), broadcast(deltaR))
      else (deltaL, deltaR)
    dl.join(baseR, keys)
      .unionByName(baseL.join(dr, keys))
      .unionByName(dl.join(dr, keys))
  }

  /** Watermarked STREAM-STREAM inner join: rows pair when they share
    * `keys` and their event times sit within ±`within` of each other.
    * Both sides carry a watermark and the join condition carries the
    * time bound — the two ingredients Structured Streaming needs to
    * know when buffered state for a key can be dropped (without them
    * the state store grows without bound; with them each side retains
    * at most lateness+within of history). Both edges of the ±within
    * bound are CLOSED — an interval join evaluates each pair once, so
    * there is no double-pairing to guard against, and an asymmetric
    * edge would silently accept a row exactly `within` early while
    * rejecting one exactly `within` late. Column names must be
    * disjoint apart from `keys` (the standard pre-rename contract).
    * Works identically as a batch join — the spec pins stream output
    * == batch join output. */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      lateness: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    val keyCond = keys.map(k => l(k) === r(k)).reduce(_ && _)
    val bound =
      expr(s"`$rightTs` >= `$leftTs` - INTERVAL $within") &&
        expr(s"`$rightTs` <= `$leftTs` + INTERVAL $within")
    keys.foldLeft(l.join(r, keyCond && bound))((df, k) => df.drop(r(k)))
  }

  def dedupStream(events: DataFrame, tsCol: String, keys: Seq[String],
      lateness: String = "1 day"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Event-time windowed rollup with a watermark — the streaming form
    * of the daily-entries materialized view (A11): tumbling 1-day
    * windows, late data within `lateness` still lands in its window. */
  def dailyRollup(events: DataFrame, tsCol: String,
      lateness: String = "1 day"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), "1 day").as("day"), col("branch_id"))
      .agg(count(lit(1)).as("n_entries"))
      .select(col("day.start").cast("date").as("entry_day"),
        col("branch_id"), col("n_entries"))

  /** Self-maintaining streaming ANN deployment: each micro-batch of
    * embedding JSONL appends O(delta) to the PUBLISHED IVF-PQ
    * deployment at `deployPath` (frozen-asset encode + insert-ignore
    * commit), and when the append drift trips [[graft.operators.Ann
    * .ivfCellStats]]'s occupancy-skew flag, the batch RETRAINS on the
    * full corpus and swaps the deployment atomically — searches in
    * flight keep their snapshot; the next load sees the new trio.
    *
    * Idempotency under at-least-once replay, by ORDER of effects:
    * fresh vectors are the anti-join against `vectorsPath`; the index
    * commits FIRST (insert-ignore on vector id — re-delivery no-ops),
    * the raw vectors append SECOND. A crash between the two replays
    * as: ids still absent from `vectorsPath` → re-encoded →
    * insert-ignore drops the already-indexed rows → vectors append
    * completes. A batch fully applied replays as an empty `fresh` and
    * touches nothing — no empty commit-log versions from reruns.
    *
    * The initial deployment must exist (one [[graft.operators.Ann
    * .ivfPqRetrain]] on the seed corpus publishes it) — a stream that
    * silently trains on its first micro-batch would freeze assets on
    * whatever sliver arrived first. `vectorsPath` is the SYSTEM OF
    * RECORD the drift retrain re-trains from, so the seed corpus's
    * raw vectors must be written there too (PQ codes are lossy — the
    * deployment cannot reconstruct them). A deployment without a
    * vectors table is refused at start: the first drift-triggered
    * retrain would otherwise silently drop every seed vector from
    * the index. */
  def annIndexStream(spark: SparkSession, bronzeGlob: String,
      vectorsPath: String, deployPath: String, checkpoint: String,
      idExpr: String, vecExpr: String, m: Int, dsub: Int,
      nlist: Int, lloydIters: Int, ksub: Int, pqIters: Int,
      skewBound: Double = 4.0): Unit = {
    import graft.operators.Ann
    require(Ann.ivfPqLoad(spark, deployPath).isEmpty ||
      MergeOps.readIfExists(spark, vectorsPath).isDefined,
      s"annIndexStream: a deployment exists at $deployPath but " +
        s"$vectorsPath is empty — vectorsPath is the system of record " +
        "retrain re-trains from; write the seed corpus's raw vectors " +
        "there before streaming, or the first drift-triggered retrain " +
        "would silently drop every seed vector")
    val stream = spark.readStream
      .format("text")
      .load(bronzeGlob)
      .withColumnRenamed("value", "raw_data")
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ss = batch.sparkSession
        val incoming = batch
          .withColumn("vec_id", expr(idExpr))
          .withColumn("v", expr(vecExpr))
          .filter(col("vec_id").isNotNull && col("v").isNotNull)
          .select("vec_id", "v")
          .dropDuplicates("vec_id")
        val exVecs = MergeOps.readIfExists(ss, vectorsPath)
          .getOrElse(incoming.limit(0))
        val fresh = incoming.join(exVecs.select("vec_id"),
          Seq("vec_id"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          if (!fresh.isEmpty) {
            Ann.ivfPqAppendCommit(ss, deployPath, fresh, "vec_id", "v",
              m, dsub)
            fresh.write.mode("append").parquet(vectorsPath)
            val (index, _, _) = Ann.ivfPqLoad(ss, deployPath).get
            val drifted = Ann.ivfCellStats(index, skewBound)
              .filter(col("retrain")).limit(1).count() > 0
            if (drifted) {
              Ann.ivfPqRetrain(ss, deployPath,
                ss.read.parquet(vectorsPath).select("vec_id", "v"),
                "vec_id", "v", nlist, lloydIters, m, dsub, ksub,
                pqIters)
              ()
            }
          }
        } finally {
          fresh.unpersist(blocking = false)
          // drain operator-tracked per-batch caches (the Bench/Verify
          // inter-query discipline): the dedup operators register
          // their batch-bounded persists with CacheRegistry; a
          // streaming driver that never releases accumulates one set
          // per micro-batch for the life of the query
          graft.CacheRegistry.release()
        }
      }
      .start()
    q.awaitTermination()
  }
}
