package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest-neighbor search, composed end-to-end:
  *
  *   coarse quantize (assign every vector to its nearest centroid)
  *   → probe the `nprobe` nearest cells per query
  *   → exact cosine rerank INSIDE those cells only
  *   → top-k per query.
  *
  * Scale shape: centroids are tiny and broadcast (cells ~ √n in
  * practice); the corpus-side assignment is one broadcast-join pass;
  * the search never touches candidates outside the probed cells, so
  * per-query cost is corpus/ncells × nprobe instead of the full scan
  * (t10's brute-force baseline). Determinism: distance ties break on
  * centroid id, cosine is rounded then tied on candidate id — the same
  * total order any engine computes.
  */
object Ann {

  import org.apache.spark.sql.GraftColumnBridge.{column => kcol, expression => kexpr}
  import graft.expressions.{NearestCell, PqCodes}

  // ---- r12-optimization: row-local assignment kernels ---------------
  //
  // Centroid and codebook tables are SMALL BY CONTRACT everywhere in
  // this module (every pre-r12 call site broadcast them), so nearest-
  // centroid assignment is a pure row-local function of the vector.
  // The collect-then-embed helpers below replace the old
  // crossJoin(broadcast) → min(struct) → join-vector-back plan shape:
  // per assignment pass they remove the n × ncents row expansion, one
  // Exchange of (id, cell, d2), and one Exchange of the corpus join-
  // back (guide §2.4 "remove shuffles outright" / §8 "move heavy rows
  // once") — per Lloyd iteration, per encode, per index build.
  // Argmin semantics (tie on smallest id, sequential widened fold)
  // are bit-identical to the join form — see AnnKernels.scala; every
  // ANN oracle gate replays them unchanged.

  /** Driver-collect a centroid frame into the (ids, vectors) table
    * [[graft.expressions.NearestCell]] embeds — sorted by id (the
    * argmin tie-break order), vectors widened to double exactly as
    * the sqDist kernel widens floats. */
  private def collectCentroidTable(centroids: DataFrame,
      centIdCol: String, centVecCol: String)
      : (IndexedSeq[Long], IndexedSeq[IndexedSeq[Double]]) = {
    val rows = centroids
      .select(col(centIdCol).cast("long"),
        col(centVecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq))
      .sortBy(_._1)
    (rows.map(_._1).toIndexedSeq, rows.map(_._2).toIndexedSeq)
  }

  /** Driver-collect a (sub, code, cv) codebook frame into the
    * per-subspace table [[graft.expressions.PqCodes]] embeds —
    * subspaces ascending, codes ascending within each. */
  private def collectBookTable(books: DataFrame)
      : IndexedSeq[IndexedSeq[(Int, IndexedSeq[Double])]] =
    books.select(col("sub").cast("int"), col("code").cast("int"),
      col("cv").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toIndexedSeq))
      .groupBy(_._1).toIndexedSeq.sortBy(_._1)
      .map(_._2.map(t => (t._2, t._3)).sortBy(_._1).toIndexedSeq)

  private def nearestCellCol(vec: Column, ids: IndexedSeq[Long],
      cents: IndexedSeq[IndexedSeq[Double]]): Column =
    kcol(NearestCell(kexpr(vec), ids, cents))

  private def pqCodesCol(vec: Column,
      books: IndexedSeq[IndexedSeq[(Int, IndexedSeq[Double])]]): Column =
    kcol(PqCodes(kexpr(vec), books))

  /** Distributed k-means (Lloyd) training for the IVF coarse quantizer
    * — the missing half of [[ivfSearch]]: a quantizer is only as good
    * as its centroids, and seed vectors are not centroids.
    *
    *   init: the `nlist` smallest-id vectors (deterministic — no RNG,
    *         so any engine converges to the same cells);
    *   step: broadcast-assign every vector to its nearest centroid
    *         ([[ivfAssign]] IS the assign step) → per-cell, per-dim
    *         mean → new centroids; a cell that captured no vectors
    *         keeps its previous centroid.
    *
    * Scale shape: each iteration is one broadcast pass over the corpus
    * plus one narrow (cell, dim) shuffle of decimal partial sums; the
    * driver holds only nlist × dims doubles between iterations (the
    * collect truncates plan lineage — iteration count never deepens
    * the plan the executors see).
    *
    * Determinism (the property the t23 gate proves hash-exact against
    * an independent engine): per-dim sums are floor-quantized integers
    * (floor(x·10⁶) — exact, order-independent under any shuffle
    * schedule, and floor has no round-half ambiguity, unlike a decimal
    * cast where engines disagree on float midpoints) and the mean is
    * one double division of that exact sum. Distance compares and the
    * centroid-id tie-break are row-local sequential folds. */
  def trainCentroids(vectors: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int): DataFrame = {
    require(nlist > 0 && iters >= 0)
    val spark = vectors.sparkSession
    import spark.implicits._
    if (iters == 0)
      // pre-r12 zero-iteration contract: seed vectors, ORIGINAL
      // element type (float inputs stay float)
      return vectors.orderBy(col(idCol).asc).limit(nlist)
        .select(col(idCol).cast("long").as("cent_id"), col(vecCol).as("cv"))
    // r12 shape: centroids live on the driver between iterations
    // (nlist × dims doubles — the same thing the old collect held);
    // each iteration is ONE job — row-local assign, posexplode, one
    // narrow (cell, pos) aggregate — instead of assign-shuffle +
    // corpus join-back + mean shuffle + driver join. The empty-cell
    // carry-forward is a driver-side merge (means has ≤ nlist rows).
    var cents: IndexedSeq[(Long, IndexedSeq[Double])] =
      vectors.orderBy(col(idCol).asc).limit(nlist)
        .select(col(idCol).cast("long"),
          col(vecCol).cast("array<double>"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq))
        .sortBy(_._1).toIndexedSeq
    for (_ <- 0 until iters) {
      val ids = cents.map(_._1)
      val cvs = cents.map(_._2)
      val means = vectors
        .select(nearestCellCol(col(vecCol), ids, cvs)
          .getField("cell").as("cent_id"),
          posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("cent_id", "pos")
        .agg(sum(floor(col("x") * lit(1e6))).as("s"),
          count(lit(1)).as("n"))
        .select(col("cent_id"), col("pos"),
          (col("s").cast("double") / (lit(1e6) * col("n"))).as("m"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1)
      cents = cents.map { case (id, old) =>
        means.get(id) match {
          case Some(rows) =>
            (id, rows.sortBy(_._2).map(_._3).toIndexedSeq)
          case None => (id, old) // empty cell keeps its centroid
        }
      }
    }
    cents.map { case (id, cv) => (id, cv: Seq[Double]) }
      .toDF("cent_id", "cv")
  }

  /** Sum of squared distances to the assigned centroid — the k-means
    * objective; monotonically non-increasing over [[trainCentroids]]
    * iterations (asserted in AnnSpec). Decimal-exact so the monotone
    * check can't be defeated by float reassociation. */
  def kmeansObjective(vectors: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): Double =
    ivfAssignCells(vectors, idCol, vecCol, cents, "cent_id", "cv")
      .select(col("d2").cast("decimal(28,10)").as("d2"))
      .agg(sum("d2").cast("double")).collect()(0).getDouble(0)

  /** Assign each (id, vec) row to its nearest centroid (squared-L2).
    * Output: (idCol, vec, cell). `centroids` must be small — it is
    * driver-collected and embedded in the plan (the same size
    * contract under which the pre-r12 form broadcast it).
    *
    * The argmin is the row-local [[graft.expressions.NearestCell]]
    * kernel: (d2 asc, cent_id asc) tie-break bit-identical to the old
    * `min(struct(d2, cent_id))` aggregate, but with ZERO exchanges —
    * the old shape paid the n × ncents expansion through a
    * HashAggregate, one narrow shuffle for the argmin, and one more
    * shuffle to join the vector column back; all three are gone, and
    * the assignment fuses into whatever codegen stage reads the
    * vectors. A NULL or dimension-mismatched vector now yields a NULL
    * cell (the join form emitted a degenerate all-null-distance row);
    * no gated corpus contains one. */
  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String,
      centVecCol: String): DataFrame = {
    val (ids, cents) = collectCentroidTable(centroids, centIdCol,
      centVecCol)
    if (ids.isEmpty)
      // empty table: the old crossJoin produced no rows
      return vectors.filter(lit(false))
        .select(col(idCol), col(vecCol), lit(null).cast("long").as("cell"))
    vectors.select(col(idCol), col(vecCol),
      nearestCellCol(col(vecCol), ids, cents).getField("cell").as("cell"))
  }

  /** Narrow assignment — (idCol, cell, d2) without the vector column:
    * the core of [[ivfAssign]], and the right call for consumers that
    * only need cell statistics (histograms, objective sums). Same
    * row-local kernel, zero exchanges. */
  def ivfAssignCells(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String,
      centVecCol: String): DataFrame = {
    val (ids, cents) = collectCentroidTable(centroids, centIdCol,
      centVecCol)
    if (ids.isEmpty)
      return vectors.filter(lit(false))
        .select(col(idCol), lit(null).cast("long").as("cell"),
          lit(null).cast("double").as("d2"))
    vectors
      .select(col(idCol),
        nearestCellCol(col(vecCol), ids, cents).as("__b"))
      .select(col(idCol), col("__b.cell").as("cell"), col("__b.d2").as("d2"))
  }

  // --------------------------------------------------------------------
  // Product quantization (PQ) — the memory side of 100-TB ANN. IVF
  // prunes WHICH vectors a query touches; PQ shrinks WHAT each touch
  // costs: a d-dim float vector (4d bytes) becomes `m` small codes
  // (m bytes, one per d/m-dim subspace), and query-time distance is a
  // table lookup instead of d multiplications. At 10⁹ × 64-dim floats
  // (256 GB of raw vectors) the PQ-coded corpus is 4 GB — it fits in
  // the page cache of a single executor wave, which is the difference
  // between an in-memory scan and a disk-bound one.
  // --------------------------------------------------------------------

  /** (id, sub, sv) sub-vector frame: vector split into `m` contiguous
    * `dsub`-dim slices. Row-local (posexplode of a transform) — the
    * split never shuffles. */
  private def subvectors(vectors: DataFrame, idCol: String,
      vecCol: String, m: Int, dsub: Int): DataFrame =
    vectors.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(col(vecCol), s * dsub + 1, lit(dsub)))).as(Seq("sub", "sv")))

  /** Assign every sub-vector to its nearest code in its subspace.
    * Output: (idCol, sub, code). Row-local since r12: the
    * [[graft.expressions.PqCodes]] kernel computes all m codes in one
    * pass over the vector (same (d2 asc, code asc) argmin the old
    * min(struct) aggregate took), so the old explode → broadcast join
    * → argmin shuffle is now a zero-exchange projection. */
  def pqAssign(vectors: DataFrame, idCol: String, vecCol: String,
      books: DataFrame, m: Int, dsub: Int): DataFrame = {
    val b = collectBookTable(books)
    if (b.isEmpty)
      return vectors.filter(lit(false))
        .select(col(idCol), lit(null).cast("int").as("sub"),
          lit(null).cast("int").as("code"))
    vectors
      .select(col(idCol),
        posexplode(pqCodesCol(col(vecCol), b)).as(Seq("sub", "code")))
  }

  /** Per-subspace distributed k-means — [[trainCentroids]] run over all
    * `m` subspaces AT ONCE (one corpus pass per iteration trains every
    * codebook; m sequential trainings would pay m passes).
    *
    * Output: (sub, code, cv) with `code` in [0, ksub). Init is
    * deterministic: code c of every subspace is the c-th smallest-id
    * vector's sub-slice (no RNG — any engine trains to the same books).
    * Means are floor(x·10⁶)-exact per (sub, code, dim), empty codes
    * keep their previous codeword; the driver holds m × ksub × dsub
    * doubles between iterations (the collect truncates plan lineage).
    * Determinism is gate-proven: t28/t29 replicate full trainings in
    * DuckDB hash-exact. */
  def trainPq(vectors: DataFrame, idCol: String, vecCol: String,
      m: Int, dsub: Int, ksub: Int, iters: Int): DataFrame = {
    require(m > 0 && dsub > 0 && ksub > 0 && iters >= 0)
    val spark = vectors.sparkSession
    import spark.implicits._
    if (iters == 0)
      // pre-r12 zero-iteration contract: seed slices, ORIGINAL
      // element type, via the window-rank init
      return subvectors(vectors, idCol, vecCol, m, dsub)
        .withColumn("__rn", row_number().over(
          Window.partitionBy("sub").orderBy(col(idCol).asc)))
        .filter(col("__rn") <= ksub)
        .select(col("sub"), (col("__rn") - 1).cast("int").as("code"),
          col("sv").as("cv"))
    // r12 shape (mirrors trainCentroids): books live on the driver
    // between iterations. Init — code c of subspace s is the c-th
    // smallest-id vector's slice s — comes off ONE limit(ksub)
    // collect instead of a corpus-wide explode + window rank; each
    // iteration is ONE job: row-local PqCodes assign, posexplode of
    // the raw vector (sub = pos / dsub), one narrow (sub, code, pos)
    // aggregate. The old loop paid, per iteration, the explode +
    // broadcast join + argmin shuffle of pqAssign PLUS a corpus-wide
    // (id, sub) join of sub-vectors with assignments.
    val seed = vectors.orderBy(col(idCol).asc).limit(ksub)
      .select(col(vecCol).cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).toIndexedSeq)
    var books: IndexedSeq[IndexedSeq[(Int, IndexedSeq[Double])]] =
      IndexedSeq.tabulate(m) { s =>
        seed.zipWithIndex.map { case (v, c) =>
          (c, v.slice(s * dsub, s * dsub + dsub))
        }.toIndexedSeq
      }
    for (_ <- 0 until iters) {
      val means = vectors
        .select(pqCodesCol(col(vecCol), books).as("__codes"),
          posexplode(col(vecCol)).as(Seq("__p", "x")))
        .filter(col("__p") < m * dsub)
        .select((col("__p") / lit(dsub)).cast("int").as("sub"),
          element_at(col("__codes"),
            (col("__p") / lit(dsub)).cast("int") + 1).as("code"),
          (col("__p") % lit(dsub)).as("pos"), col("x"))
        .groupBy("sub", "code", "pos")
        .agg(sum(floor(col("x") * lit(1e6))).as("s"), count(lit(1)).as("n"))
        .select(col("sub"), col("code"), col("pos"),
          (col("s").cast("double") / (lit(1e6) * col("n"))).as("mv"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
        .groupBy(t => (t._1, t._2))
      books = books.zipWithIndex.map { case (book, s) =>
        book.map { case (code, old) =>
          means.get((s, code)) match {
            case Some(rows) =>
              (code, rows.sortBy(_._3).map(_._4).toIndexedSeq)
            case None => (code, old) // empty code keeps its codeword
          }
        }
      }
    }
    books.zipWithIndex.flatMap { case (book, s) =>
      book.map { case (code, cv) => (s, code, cv: Seq[Double]) }
    }.toDF("sub", "code", "cv")
  }

  /** PQ-encode the corpus: (idCol, codes) where `codes[s]` is the
    * nearest codeword of subspace s. This is THE compressed
    * representation — 8 + m bytes per vector — that downstream ADC
    * search scans instead of the raw corpus. */
  def pqEncode(vectors: DataFrame, idCol: String, vecCol: String,
      books: DataFrame, m: Int, dsub: Int): DataFrame = {
    // r12: one zero-exchange projection — the old path exploded m
    // rows per vector, broadcast-joined the books, argmin-shuffled,
    // then re-assembled the codes array with a second shuffle
    val b = collectBookTable(books)
    if (b.isEmpty)
      return vectors.filter(lit(false))
        .select(col(idCol), lit(null).cast("array<int>").as("codes"))
    vectors
      .select(col(idCol), pqCodesCol(col(vecCol), b).as("codes"))
      // a NULL / mis-sized vector encoded to no rows in the explode
      // form; match it (the kernel yields NULL codes there)
      .filter(col("codes").isNotNull)
  }

  /** Asymmetric-distance (ADC) top-k search over a PQ-encoded corpus:
    * for each probe, distance ≈ Σ_s LUT[s][codes[s]] where LUT[s][c] =
    * ‖probe_slice(s) − codeword(s,c)‖² — m array lookups per candidate
    * instead of d multiplications, and the raw corpus is never read.
    *
    * Output: (p_id, rn, c_id, ad2) — `ad2` the approximate squared L2,
    * rounded, ties on candidate id. A probe never matches itself.
    *
    * Scale shape: the LUT frame is (probes × m × ksub) rows, folded to
    * one nested array per probe and BROADCAST; scoring is a row-local
    * sequential fold over the codes array (whole-stage codegen, no
    * shuffle), so the only shuffle in the operator is the final
    * per-probe top-k on narrow (p_id, c_id, ad2) rows. For probe sets
    * too large to broadcast, shard the probes and union. */
  def pqSearchAdc(codes: DataFrame, codesIdCol: String,
      probes: DataFrame, probeIdCol: String, probeVecCol: String,
      books: DataFrame, m: Int, dsub: Int, k: Int): DataFrame = {
    require(k > 0)
    val pd: Column = VectorOps.sqDist(
      slice(col(probeVecCol), col("sub") * dsub + 1, lit(dsub)),
      col("cv"))
    val lut = probes.crossJoin(broadcast(books))
      .select(col(probeIdCol).as("p_id"), col("sub"), col("code"),
        pd.as("pd"))
      .groupBy("p_id", "sub")
      .agg(transform(
        array_sort(collect_list(struct(col("code"), col("pd")))),
        x => x.getField("pd")).as("lsub"))
      .groupBy("p_id")
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("lsub")))),
        x => x.getField("lsub")).as("lut"))
    val scored = codes.crossJoin(broadcast(lut))
      .filter(col(codesIdCol) =!= col("p_id"))
      .select(col("p_id"), col(codesIdCol).as("c_id"),
        round(aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
          (acc, s) => acc + element_at(element_at(col("lut"), s + 1),
            element_at(col("codes"), s + 1) + 1)), 6).as("ad2"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("p_id")
          .orderBy(col("ad2").asc, col("c_id").asc)))
      .filter(col("rn") <= k)
      .select("p_id", "rn", "c_id", "ad2")
  }

  /** Residual frame: (idCol, cell, rv) where rv = v − centroid(cell).
    * Residuals are what production IVF-PQ quantizes (FAISS
    * IndexIVFPQ): within a cell, vectors share the cell mean, so the
    * residual distribution is tighter than the raw one and the same
    * codebook budget buys less quantization error. One broadcast
    * assignment pass + one broadcast join back to subtract. */
  def residuals(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String,
      centVecCol: String): DataFrame =
    ivfAssign(vectors, idCol, vecCol, centroids, centIdCol, centVecCol)
      .join(broadcast(centroids
        .select(col(centIdCol).as("cell"), col(centVecCol).as("__cv"))),
        Seq("cell"))
      .select(col(idCol), col("cell"),
        zip_with(col(vecCol), col("__cv"), (x, y) => x - y).as("rv"))

  /** Train ONE shared PQ codebook on the residual corpus (classic
    * IVF-PQ: codebooks are shared across cells, trained on residuals).
    * Same determinism contract as [[trainPq]]. */
  def trainPqResidual(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String,
      m: Int, dsub: Int, ksub: Int, iters: Int): DataFrame =
    trainPq(residuals(vectors, idCol, vecCol, centroids, centIdCol,
      centVecCol), idCol, "rv", m, dsub, ksub, iters)

  /** PQ-encode residuals: (idCol, cell, codes) — the complete
    * residual IVF-PQ index row. */
  def pqEncodeResidual(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String,
      books: DataFrame, m: Int, dsub: Int): DataFrame = {
    val res = residuals(vectors, idCol, vecCol, centroids, centIdCol,
      centVecCol)
    res.select(col(idCol), col("cell"))
      .join(pqEncode(res, idCol, "rv", books, m, dsub), Seq(idCol))
  }

  /** Residual IVF-PQ search: candidates come from the `nprobe` nearest
    * cells and score by ADC over RESIDUAL lookup tables — for probe p
    * and cell c, LUT[s][j] = ‖slice(p − centroid_c, s) − codeword(s,j)‖²,
    * so the table is per (probe, cell): nprobe × m × ksub entries per
    * probe, still broadcast-sized. Same output contract as
    * [[ivfPqSearch]]; same scale shape (the coded index is scanned
    * row-locally; only the top-k shuffles). */
  def ivfPqSearchResidual(vectors: DataFrame, idCol: String,
      vecCol: String, probes: DataFrame, centroids: DataFrame,
      centIdCol: String, centVecCol: String, books: DataFrame,
      m: Int, dsub: Int, k: Int, nprobe: Int): DataFrame = {
    require(k > 0 && nprobe > 0)
    val index = pqEncodeResidual(vectors, idCol, vecCol, centroids,
      centIdCol, centVecCol, books, m, dsub)
      .select(col(idCol).as("c_id"), col("cell"), col("codes"))
    val pcells = probes.crossJoin(broadcast(centroids))
      .withColumn("__d2", VectorOps.sqDist(col(vecCol), col(centVecCol)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(idCol)
          .orderBy(col("__d2").asc, col(centIdCol).asc)))
      .filter(col("__rn") <= nprobe)
      .select(col(idCol).as("p_id"),
        col(centIdCol).as("cell"),
        zip_with(col(vecCol), col(centVecCol), (x, y) => x - y)
          .as("__prv"))
    val pd: Column = VectorOps.sqDist(
      slice(col("__prv"), col("sub") * dsub + 1, lit(dsub)),
      col("cv"))
    val lut = pcells.crossJoin(broadcast(books))
      .select(col("p_id"), col("cell"), col("sub"), col("code"),
        pd.as("pd"))
      .groupBy("p_id", "cell", "sub")
      .agg(transform(
        array_sort(collect_list(struct(col("code"), col("pd")))),
        x => x.getField("pd")).as("lsub"))
      .groupBy("p_id", "cell")
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("lsub")))),
        x => x.getField("lsub")).as("lut"))
    val scored = index.join(broadcast(lut), Seq("cell"))
      .filter(col("c_id") =!= col("p_id"))
      .select(col("p_id"), col("c_id"),
        round(aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
          (acc, s) => acc + element_at(element_at(col("lut"), s + 1),
            element_at(col("codes"), s + 1) + 1)), 6).as("ad2"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("p_id")
          .orderBy(col("ad2").asc, col("c_id").asc)))
      .filter(col("rn") <= k)
      .select("p_id", "rn", "c_id", "ad2")
  }

  /** Composed IVF-PQ search — the production 100-TB ANN shape: IVF
    * prunes WHICH vectors a probe touches (only the `nprobe` nearest
    * cells), PQ prices WHAT each touch costs (ADC table lookups over
    * m byte-codes instead of d-dim float math; the raw corpus is never
    * read at query time).
    *
    * Output: (p_id, rn, c_id, ad2) like [[pqSearchAdc]], restricted to
    * candidates in probed cells.
    *
    * Scale shape: the persistent index is the narrow
    * (id, cell, codes) frame — 8 + 8 + m bytes per corpus vector.
    * Per query: centroids broadcast once for probe-cell selection, the
    * (probe-cells ⨝ probe-LUT) frame is broadcast, candidates stream
    * through a row-local fold, and the only shuffle is the final
    * per-probe top-k over narrow rows. */
  /** The persistent IVF-PQ index rows for `vectors` against frozen
    * assets: (c_id, cell, codes) — 8 + 8 + m bytes per corpus vector,
    * the thing a production deployment materializes to a table and
    * [[ivfPqAppend]] grows. */
  def ivfPqIndex(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String,
      books: DataFrame, m: Int, dsub: Int): DataFrame =
    ivfAssignCells(vectors, idCol, vecCol, centroids,
      centIdCol, centVecCol).drop("d2")
      .join(pqEncode(vectors, idCol, vecCol, books, m, dsub), Seq(idCol))
      .select(col(idCol).as("c_id"), col("cell"), col("codes"))

  /** Append-only index maintenance: encode ONLY `newVectors` against
    * the FROZEN centroids + codebook and union onto the existing
    * (c_id, cell, codes) frame. No existing row is touched, so a
    * daily append costs O(delta), never O(corpus) — the amortized
    * production shape ([[graft.operators.NearDup]]'s incremental
    * band-index pattern applied to ANN assets).
    *
    * Equivalence contract (gated by t66): cell assignment and PQ
    * encoding are deterministic row-local functions of the frozen
    * assets, so append-encode followed by search equals
    * rebuild-encode-the-union followed by search, bit for bit. The
    * price of freezing is drift: appended vectors quantize against
    * codewords trained before they existed — watch [[ivfCellStats]]
    * and retrain when it flags. */
  def ivfPqAppend(index: DataFrame, newVectors: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, centIdCol: String,
      centVecCol: String, books: DataFrame, m: Int, dsub: Int): DataFrame =
    index.unionByName(ivfPqIndex(newVectors, idCol, vecCol, centroids,
      centIdCol, centVecCol, books, m, dsub))

  /** Per-cell occupancy + the retrain signal for a frozen-asset index:
    * (cell, n, skew = n/avg-n, retrain = skew > bound). One narrow
    * count per cell, one single-row global average broadcast back —
    * no global window, no driver loop. A cell whose occupancy runs
    * `skewBound`× past the mean means the frozen centroids no longer
    * tile the data (append drift): probes hitting it scan `skew`×
    * the candidates they should, and it is time to retrain. */
  def ivfCellStats(index: DataFrame, skewBound: Double = 4.0): DataFrame = {
    require(skewBound > 0)
    val perCell = index.groupBy("cell").agg(count(lit(1)).as("n"))
    val global = perCell.agg(avg(col("n")).as("avg_n"))
    perCell.crossJoin(broadcast(global))
      .select(col("cell"), col("n"),
        (col("n") / col("avg_n")).as("skew"),
        (col("n") / col("avg_n") > skewBound).as("retrain"))
  }

  def ivfPqSearch(vectors: DataFrame, idCol: String, vecCol: String,
      probes: DataFrame, centroids: DataFrame, centIdCol: String,
      centVecCol: String, books: DataFrame, m: Int, dsub: Int,
      k: Int, nprobe: Int): DataFrame =
    ivfPqSearchIndexed(
      ivfPqIndex(vectors, idCol, vecCol, centroids, centIdCol,
        centVecCol, books, m, dsub),
      probes, idCol, vecCol, centroids, centIdCol, centVecCol,
      books, m, dsub, k, nprobe)

  /** [[ivfPqSearch]] over a PREBUILT (c_id, cell, codes) index frame —
    * the entry a deployment with a materialized, append-maintained
    * index actually calls; the corpus vectors are never touched. */
  def ivfPqSearchIndexed(index: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, centroids: DataFrame,
      centIdCol: String, centVecCol: String, books: DataFrame,
      m: Int, dsub: Int, k: Int, nprobe: Int): DataFrame = {
    require(k > 0 && nprobe > 0)
    val pcells = probes.crossJoin(broadcast(centroids))
      .withColumn("__d2", VectorOps.sqDist(col(vecCol), col(centVecCol)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(idCol)
          .orderBy(col("__d2").asc, col(centIdCol).asc)))
      .filter(col("__rn") <= nprobe)
      .select(col(idCol).as("p_id"), col(centIdCol).as("cell"))
    val pd: Column = VectorOps.sqDist(
      slice(col(vecCol), col("sub") * dsub + 1, lit(dsub)),
      col("cv"))
    val lut = probes.crossJoin(broadcast(books))
      .select(col(idCol).as("p_id"), col("sub"), col("code"), pd.as("pd"))
      .groupBy("p_id", "sub")
      .agg(transform(
        array_sort(collect_list(struct(col("code"), col("pd")))),
        x => x.getField("pd")).as("lsub"))
      .groupBy("p_id")
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("lsub")))),
        x => x.getField("lsub")).as("lut"))
    val probeSide = pcells.join(lut, Seq("p_id"))
    val scored = index.join(broadcast(probeSide), Seq("cell"))
      .filter(col("c_id") =!= col("p_id"))
      .select(col("p_id"), col("c_id"),
        round(aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
          (acc, s) => acc + element_at(element_at(col("lut"), s + 1),
            element_at(col("codes"), s + 1) + 1)), 6).as("ad2"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("p_id")
          .orderBy(col("ad2").asc, col("c_id").asc)))
      .filter(col("rn") <= k)
      .select("p_id", "rn", "c_id", "ad2")
  }

  /** Exact re-rank stage over [[ivfPqSearchIndexed]] — the standard
    * refinement step production ANN deployments run after ADC (FAISS'
    * IndexRefineFlat shape): ADC scores carry PQ quantization error,
    * so the true nearest neighbor is sometimes ranked just below a
    * coarser candidate. Retrieve `k·refine` candidates by ADC, join
    * ONLY those ids back to the raw vectors, re-score with exact
    * squared L2, return the exact top-`k`.
    *
    * Scale shape: the candidate frame is |probes|·k·refine rows —
    * tiny — so it BROADCASTS against the corpus (one corpus scan,
    * no shuffle of the vectors); probes broadcast likewise. The cost
    * over plain ADC is one broadcast-hash pass over the corpus and
    * |candidates| exact d-dim distances — the recall recovery is
    * measured in AnnRecallSpec. Output: (p_id, rn, c_id, d2) with d2
    * the EXACT squared distance (not ADC), rounded to 6. */
  def ivfPqSearchRefined(index: DataFrame, vectors: DataFrame,
      probes: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String,
      books: DataFrame, m: Int, dsub: Int, k: Int, nprobe: Int,
      refine: Int = 4): DataFrame = {
    require(refine >= 1, s"refine must be >= 1, got $refine")
    val cand = ivfPqSearchIndexed(index, probes, idCol, vecCol,
      centroids, centIdCol, centVecCol, books, m, dsub,
      k * refine, nprobe)
      .select(col("p_id"), col("c_id"))
    val corpus = vectors.select(col(idCol).as("c_id"),
      col(vecCol).as("__cv"))
    val probeV = probes.select(col(idCol).as("p_id"),
      col(vecCol).as("__pv"))
    corpus.join(broadcast(cand), Seq("c_id"))
      .join(broadcast(probeV), Seq("p_id"))
      .withColumn("d2",
        round(VectorOps.sqDist(col("__pv"), col("__cv")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy("p_id").orderBy(col("d2").asc, col("c_id").asc)))
      .filter(col("rn") <= k)
      .select("p_id", "rn", "c_id", "d2")
  }

  /** Full IVF search: for each probe row, the top-`k` nearest corpus
    * vectors by exact cosine among the `nprobe` nearest cells.
    * Output: (probe id as p_id, rn, candidate id as c_id, cos).
    * A probe never matches itself. */
  def ivfSearch(vectors: DataFrame, idCol: String, vecCol: String,
      probes: DataFrame, centroids: DataFrame, centIdCol: String,
      centVecCol: String, k: Int, nprobe: Int): DataFrame = {
    require(k > 0 && nprobe > 0)
    val assigned = ivfAssign(vectors, idCol, vecCol,
      centroids, centIdCol, centVecCol)
      .withColumn("__cn", VectorOps.norm(col(vecCol)))
      .select(col(idCol).as("c_id"), col(vecCol).as("__cv"),
        col("__cn"), col("cell"))
    // probe → nprobe nearest cells (same broadcast pass as assignment)
    val pcells = probes.crossJoin(broadcast(centroids))
      .withColumn("__d2", VectorOps.sqDist(col(vecCol), col(centVecCol)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(idCol)
          .orderBy(col("__d2").asc, col(centIdCol).asc)))
      .filter(col("__rn") <= nprobe)
      .withColumn("__pn", VectorOps.norm(col(vecCol)))
      .select(col(idCol).as("p_id"), col(vecCol).as("__pv"),
        col("__pn"), col(centIdCol).as("cell"))
    // each candidate lives in exactly one cell (assignment is rn = 1),
    // so a (p_id, c_id) pair appears at most once — no dedup needed.
    // pcells is (queries × nprobe) rows — broadcast it so the corpus
    // side streams without a shuffle on the low-cardinality cell key
    // (post-window stats are unknown, so the planner would otherwise
    // pick a sort-merge join on ncells distinct values — skew bait).
    // For probe sets too large to broadcast, repartition both sides
    // on cell instead.
    val reranked = broadcast(pcells).join(assigned, "cell")
      .filter(col("p_id") =!= col("c_id"))
      .select(col("p_id"), col("c_id"),
        VectorOps.cosine(col("__pv"), col("__cv"),
          col("__pn"), col("__cn")).as("cos"))
    reranked
      .withColumn("rn", row_number().over(
        Window.partitionBy("p_id")
          .orderBy(col("cos").desc, col("c_id").asc)))
      .filter(col("rn") <= k)
      .select("p_id", "rn", "c_id", "cos")
  }

  // ---- deployment lifecycle: publish / load / retrain ------------

  /** Atomically publish a complete IVF-PQ deployment — the index rows
    * AND the frozen assets (coarse centroids + PQ codebook) they were
    * encoded against — as ONE commit-log snapshot at `path`. The
    * three frames fold into a single unified-schema table because the
    * commit log's atomicity unit is one manifest: as separate tables,
    * a reader could pair a fresh index with stale codewords and score
    * silently wrong distances; as one snapshot, the trio is
    * consistent by construction and old deployments stay readable
    * ([[CommitLogTableFormat.readAt]]) until vacuumed. */
  private def deployNulls(pairs: (String, String)*): Seq[Column] =
    pairs.map { case (n, t) => lit(null).cast(t).as(n) }

  /** (c_id, cell, codes) index rows in the unified deployment schema. */
  private def deployIndexRows(index: DataFrame): DataFrame =
    index.select(
      (lit("index").as("kind") +: col("c_id").cast("long").as("id") +:
        col("cell").cast("long").as("cell") +:
        col("codes").cast("array<int>").as("codes") +:
        deployNulls("sub" -> "int", "code" -> "int",
          "vec" -> "array<double>")): _*)

  def ivfPqPublish(spark: org.apache.spark.sql.SparkSession,
      path: String, index: DataFrame, centroids: DataFrame,
      books: DataFrame): Unit = {
    val rows = deployIndexRows(index)
      .unionByName(centroids.select(
        (lit("cent").as("kind") +: col("cent_id").cast("long").as("id") +:
          deployNulls("cell" -> "long", "codes" -> "array<int>",
            "sub" -> "int", "code" -> "int")) :+
          col("cv").cast("array<double>").as("vec"): _*))
      .unionByName(books.select(
        (lit("book").as("kind") +:
          deployNulls("id" -> "long", "cell" -> "long",
            "codes" -> "array<int>")) ++
          Seq(col("sub").cast("int").as("sub"),
            col("code").cast("int").as("code"),
            col("cv").cast("array<double>").as("vec")): _*))
    CommitLogTableFormat.fullRefresh(spark, rows, path)
  }

  /** O(delta) append to a PUBLISHED deployment: encode `delta` against
    * the snapshot's frozen assets and commit the new index rows with
    * an insert-ignore on (kind, id) — one optimistic commit, assets
    * and existing index rows ride through untouched. Idempotent under
    * at-least-once replay: a re-delivered vector id already in the
    * index is skipped by the insert-ignore's anti-join, so a crashed
    * batch can simply run again. */
  def ivfPqAppendCommit(spark: org.apache.spark.sql.SparkSession,
      path: String, delta: DataFrame, idCol: String, vecCol: String,
      m: Int, dsub: Int): Unit = {
    val (_, cents, books) = ivfPqLoad(spark, path).getOrElse(
      throw new IllegalStateException(
        s"ivfPqAppendCommit: no published deployment at $path"))
    val rows = deployIndexRows(ivfPqIndex(delta, idCol, vecCol, cents,
      "cent_id", "cv", books, m, dsub))
    CommitLogTableFormat.insertIgnore(spark, rows, path,
      Seq("kind", "id"))
  }

  /** The (index, centroids, books) trio of the LATEST published
    * deployment at `path`, or None. All three views filter the same
    * snapshot, so they can never mix versions. */
  def ivfPqLoad(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[(DataFrame, DataFrame, DataFrame)] =
    CommitLogTableFormat.read(spark, path).map { snap =>
      (snap.filter(col("kind") === "index")
        .select(col("id").as("c_id"), col("cell"), col("codes")),
        snap.filter(col("kind") === "cent")
          .select(col("id").as("cent_id"), col("vec").as("cv")),
        snap.filter(col("kind") === "book")
          .select(col("sub"), col("code"), col("vec").as("cv")))
    }

  /** Close the maintenance loop [[ivfCellStats]] opens: when append
    * drift trips the retrain flag, re-run Lloyd AND PQ training on
    * the CURRENT corpus, re-encode every vector against the new
    * assets, and swap the whole deployment in with one atomic commit
    * ([[ivfPqPublish]]). Searches running against the previous
    * deployment keep reading its snapshot whole; the next
    * [[ivfPqLoad]] sees the new trio. Retraining is deterministic
    * (seeded by smallest-id vectors, order-free quantized sums), so
    * retrain-on-union is bit-identical to a from-scratch rebuild on
    * the same corpus — the equivalence the retrain spec pins.
    * Returns the newly committed trio. */
  def ivfPqRetrain(spark: org.apache.spark.sql.SparkSession,
      path: String, vectors: DataFrame, idCol: String, vecCol: String,
      nlist: Int, lloydIters: Int, m: Int, dsub: Int, ksub: Int,
      pqIters: Int): (DataFrame, DataFrame, DataFrame) = {
    // The coarse quantizer and the PQ codebooks train on the same
    // frozen corpus with no dependency on each other — run the two
    // driver-sequenced Lloyd loops concurrently (guide §2.6; the
    // retrain gate ran FASTER on 8 cores than 32 because the job
    // stream was serial, not because executors were busy).
    val (cents, books) = graft.Par.par2(
      trainCentroids(vectors, idCol, vecCol, nlist, lloydIters),
      trainPq(vectors, idCol, vecCol, m, dsub, ksub, pqIters))
    val index = ivfPqIndex(vectors, idCol, vecCol, cents, "cent_id",
      "cv", books, m, dsub)
    ivfPqPublish(spark, path, index, cents, books)
    ivfPqLoad(spark, path).get
  }
}
