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
    var cents = vectors.orderBy(col(idCol).asc).limit(nlist)
      .select(col(idCol).cast("long").as("cent_id"), col(vecCol).as("cv"))
    for (_ <- 0 until iters) {
      val rows = lloydStep(vectors, idCol, vecCol, cents).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
        .sortBy(_._1)
      cents = rows.toSeq.toDF("cent_id", "cv")
    }
    cents
  }

  /** One Lloyd iteration: assign → per-cell integer-exact mean →
    * new (cent_id, cv), previous centroid kept for empty cells. */
  private def lloydStep(vectors: DataFrame, idCol: String,
      vecCol: String, cents: DataFrame): DataFrame = {
    val means = ivfAssign(vectors, idCol, vecCol, cents, "cent_id", "cv")
      .select(col("cell").as("cent_id"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("cent_id", "pos")
      .agg(sum(floor(col("x") * lit(1e6))).as("s"),
        count(lit(1)).as("n"))
      .withColumn("m", col("s").cast("double") / (lit(1e6) * col("n")))
      .groupBy("cent_id")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("cv_new"))
    cents.join(means, Seq("cent_id"), "left")
      .select(col("cent_id"), coalesce(col("cv_new"), col("cv")).as("cv"))
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
    * broadcast and cross-joined.
    *
    * The argmin is a `min(struct(d2, cent_id))` aggregate, NOT a
    * row_number window: struct ordering gives exactly the
    * (d2 asc, cent_id asc) tie-break, and an aggregate combines
    * MAP-SIDE over a NARROW fixed-width buffer (fully codegen'd
    * HashAggregate — carrying the vector in the struct would demote
    * the whole stage to ObjectHashAggregate, measured 3.7× slower),
    * so the shuffle carries n narrow (id, d2, cell) rows instead of
    * the n × ncells expanded frame WITH vectors a window would move —
    * at nlist = 1024 that is a ~1000× shuffle-volume difference on
    * the corpus-sized stage every Lloyd iteration repeats. The vector
    * column rides back in by a unique-id equi-join (one narrow
    * shuffle of ids + cells; the corpus side shuffles once, which the
    * window shape also paid). */
  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String,
      centVecCol: String): DataFrame =
    vectors.join(
      ivfAssignCells(vectors, idCol, vecCol, centroids, centIdCol,
        centVecCol).drop("d2"),
      Seq(idCol))
      .select(col(idCol), col(vecCol), col("cell"))

  /** Narrow assignment — (idCol, cell, d2) without the vector column:
    * the core of [[ivfAssign]], and the right call for consumers that
    * only need cell statistics (histograms, objective sums) — they
    * skip the vector join-back entirely. */
  def ivfAssignCells(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String,
      centVecCol: String): DataFrame = {
    val d2: Column = VectorOps.sqDist(col(vecCol), col(centVecCol))
    vectors.crossJoin(broadcast(centroids))
      .groupBy(col(idCol))
      .agg(min(struct(d2.as("d2"), col(centIdCol).as("cell"))).as("__b"))
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
    * Output: (idCol, sub, code). Same narrow map-side-combined argmin
    * as [[ivfAssignCells]] — the shuffle carries (id, sub, code), never
    * the sub-vectors, and `books` (m × ksub rows) is broadcast. */
  def pqAssign(vectors: DataFrame, idCol: String, vecCol: String,
      books: DataFrame, m: Int, dsub: Int): DataFrame = {
    val d2: Column = VectorOps.sqDist(col("sv"), col("cv"))
    subvectors(vectors, idCol, vecCol, m, dsub)
      .join(broadcast(books.select(col("sub"), col("code"), col("cv"))),
        Seq("sub"))
      .groupBy(col(idCol), col("sub"))
      .agg(min(struct(d2.as("d2"), col("code").as("code"))).as("__b"))
      .select(col(idCol), col("sub"), col("__b.code").as("code"))
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
    val subs = subvectors(vectors, idCol, vecCol, m, dsub)
    var books = subs
      .withColumn("__rn", row_number().over(
        Window.partitionBy("sub").orderBy(col(idCol).asc)))
      .filter(col("__rn") <= ksub)
      .select(col("sub"), (col("__rn") - 1).cast("int").as("code"),
        col("sv").as("cv"))
    for (_ <- 0 until iters) {
      val assigned = pqAssign(vectors, idCol, vecCol, books, m, dsub)
      val means = subs.join(assigned, Seq(idCol, "sub"))
        .select(col("sub"), col("code"),
          posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("sub", "code", "pos")
        .agg(sum(floor(col("x") * lit(1e6))).as("s"), count(lit(1)).as("n"))
        .withColumn("mv", col("s").cast("double") / (lit(1e6) * col("n")))
        .groupBy("sub", "code")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("mv")))),
          x => x.getField("mv")).as("cv_new"))
      val rows = books.join(means, Seq("sub", "code"), "left")
        .select(col("sub"), col("code"),
          coalesce(col("cv_new"), col("cv")).as("cv"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        .sortBy(t => (t._1, t._2))
      books = rows.toSeq.toDF("sub", "code", "cv")
    }
    books
  }

  /** PQ-encode the corpus: (idCol, codes) where `codes[s]` is the
    * nearest codeword of subspace s. This is THE compressed
    * representation — 8 + m bytes per vector — that downstream ADC
    * search scans instead of the raw corpus. */
  def pqEncode(vectors: DataFrame, idCol: String, vecCol: String,
      books: DataFrame, m: Int, dsub: Int): DataFrame =
    pqAssign(vectors, idCol, vecCol, books, m, dsub)
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code")))),
        x => x.getField("code")).as("codes"))

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
    val cents = trainCentroids(vectors, idCol, vecCol, nlist, lloydIters)
    val books = trainPq(vectors, idCol, vecCol, m, dsub, ksub, pqIters)
    val index = ivfPqIndex(vectors, idCol, vecCol, cents, "cent_id",
      "cv", books, m, dsub)
    ivfPqPublish(spark, path, index, cents, books)
    ivfPqLoad(spark, path).get
  }
}
