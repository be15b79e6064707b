package graft

import graft.functions.VectorOps
import graft.operators.Ann
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Honest quality measurement for the approximate search family:
  * recall@k of IVF (exact rerank in probed cells), PQ-ADC (approximate
  * distance over the whole corpus), and IVF-PQ (both approximations)
  * against the exact L2 top-k, on the driver-provided embeddings
  * (real testdata, not blob fixtures — near-orthogonal synthetic
  * vectors are the HARD case for ANN, so these floors are
  * conservative). Floors are pinned from measured values with margin;
  * a structural regression (wrong cells, broken LUT indexing, a
  * codebook that stopped training) craters them to near-zero. */
class AnnRecallSpec extends SparkSpec {

  private val K = 10
  private val NProbes = 20

  private lazy val corpus = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")
    .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))

  private lazy val probes = corpus.filter(col("vec_id") < NProbes)

  /** Exact squared-L2 top-K per probe (the ground truth). */
  private lazy val exact: Map[Long, Set[Long]] = {
    val d2 = VectorOps.norm2(zip_with(col("pv"), col("v"), (x, y) => x - y))
    probes.select(col("vec_id").as("p_id"), col("v").as("pv"))
      .crossJoin(corpus)
      .filter(col("vec_id") =!= col("p_id"))
      .select(col("p_id"), col("vec_id").as("c_id"), d2.as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("p_id").orderBy(col("d2").asc, col("c_id").asc)))
      .filter(col("rn") <= K)
      .collect().groupBy(_.getLong(0))
      .map { case (p, rows) => p -> rows.map(_.getLong(1)).toSet }
  }

  private def recallOf(res: DataFrame): Double = {
    val got = res.collect().groupBy(_.getLong(0))
      .map { case (p, rows) => p -> rows.map(_.getLong(2)).toSet }
    val hits = exact.map { case (p, truth) =>
      got.getOrElse(p, Set.empty).count(truth) }.sum
    hits.toDouble / (exact.size * K)
  }

  test("recall@10 floors: IVF, PQ-ADC, IVF-PQ vs exact top-k") {
    val cents = Ann.trainCentroids(corpus, "vec_id", "v", nlist = 8,
      iters = 2)
    val books = Ann.trainPq(corpus, "vec_id", "v", m = 4, dsub = 16,
      ksub = 8, iters = 2)
    val codes = Ann.pqEncode(corpus, "vec_id", "v", books, m = 4,
      dsub = 16)

    // IVF with exact rerank: recall loss comes only from cell pruning
    val ivf = Ann.ivfSearch(corpus, "vec_id", "v", probes, cents,
      "cent_id", "cv", k = K, nprobe = 4)
      .select(col("p_id"), col("rn"), col("c_id"))
    val rIvf = recallOf(ivf)

    // PQ-ADC over the whole corpus: loss comes only from quantization
    val adc = Ann.pqSearchAdc(codes, "vec_id", probes, "vec_id", "v",
      books, m = 4, dsub = 16, k = K)
    val rAdc = recallOf(adc)

    // IVF-PQ: both losses compose
    val ivfpq = Ann.ivfPqSearch(corpus, "vec_id", "v", probes, cents,
      "cent_id", "cv", books, m = 4, dsub = 16, k = K, nprobe = 4)
    val rIvfPq = recallOf(ivfpq)

    // a finer quantizer (8 subspaces x 16 codes vs 4 x 8) must buy
    // recall — the knob a production tuning run turns
    val booksFine = Ann.trainPq(corpus, "vec_id", "v", m = 8, dsub = 8,
      ksub = 16, iters = 2)
    val codesFine = Ann.pqEncode(corpus, "vec_id", "v", booksFine,
      m = 8, dsub = 8)
    val rAdcFine = recallOf(Ann.pqSearchAdc(codesFine, "vec_id", probes,
      "vec_id", "v", booksFine, m = 8, dsub = 8, k = K))

    // exact re-rank tail: k·refine ADC candidates re-scored against
    // the raw vectors. refine=1 re-orders the SAME k candidates, so
    // its recall set equals plain IVF-PQ's (structural pin: the
    // re-rank never loses a candidate); refine=8 must RECOVER recall
    // ADC's quantization error threw away — the knob's entire point.
    val index = Ann.ivfPqIndex(corpus, "vec_id", "v", cents,
      "cent_id", "cv", books, m = 4, dsub = 16)
    val rRef1 = recallOf(Ann.ivfPqSearchRefined(index, corpus, probes,
      "vec_id", "v", cents, "cent_id", "cv", books, m = 4, dsub = 16,
      k = K, nprobe = 4, refine = 1))
    val rRef8 = recallOf(Ann.ivfPqSearchRefined(index, corpus, probes,
      "vec_id", "v", cents, "cent_id", "cv", books, m = 4, dsub = 16,
      k = K, nprobe = 4, refine = 8))

    info(f"recall@$K%d ivf=$rIvf%.3f adc=$rAdc%.3f " +
      f"adcFine=$rAdcFine%.3f ivfpq=$rIvfPq%.3f " +
      f"refined1=$rRef1%.3f refined8=$rRef8%.3f")
    assert(rRef1 == rIvfPq,
      f"refine=1 must keep exactly the ADC top-k set: $rRef1%.3f != $rIvfPq%.3f")
    assert(rRef8 > rIvfPq,
      f"exact re-rank did not recover recall: $rRef8%.3f <= $rIvfPq%.3f")
    // floors at ~half the measured values (uniform-random 64-dim
    // vectors are the quantization worst case; real embedding
    // manifolds compress far better). Structural breakage — wrong
    // cells, broken LUT indexing, untrained codebooks — lands at
    // chance level (K/corpus = 0.02) or zero, far below these.
    assert(rIvf >= 0.5, f"IVF recall collapsed: $rIvf%.3f")
    assert(rAdc >= 0.08, f"PQ-ADC recall collapsed: $rAdc%.3f")
    assert(rIvfPq >= 0.08, f"IVF-PQ recall collapsed: $rIvfPq%.3f")
    assert(rAdcFine > rAdc,
      f"finer quantizer did not improve recall: $rAdcFine%.3f <= $rAdc%.3f")
  }

  test("residual IVF-PQ beats raw IVF-PQ on clustered data") {
    // Residual quantization wins when cells carry real offsets: shift
    // each vector by +20 along dimension (label mod 64) — ten tight
    // clusters. A raw codebook must span the shifted range; the
    // residual codebook only spans within-cluster spread (the FAISS
    // IndexIVFPQ rationale). On the uniform testdata the two tie
    // (centroid offsets are tiny) — clustered is where the design
    // pays, so that is what gets pinned.
    val labeled = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        VectorOps.asDouble(col("embedding")).as("v0"))
      .select(col("vec_id"),
        zip_with(col("v0"),
          transform(sequence(lit(0), lit(63)),
            i => when(i === col("label") % 64, lit(20.0))
              .otherwise(lit(0.0))),
          (x, o) => x + o).as("v"))
    val cProbes = labeled.filter(col("vec_id") < NProbes)
    val d2 = VectorOps.norm2(zip_with(col("pv"), col("v"), (x, y) => x - y))
    val truth = cProbes.select(col("vec_id").as("p_id"), col("v").as("pv"))
      .crossJoin(labeled)
      .filter(col("vec_id") =!= col("p_id"))
      .select(col("p_id"), col("vec_id").as("c_id"), d2.as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("p_id").orderBy(col("d2").asc, col("c_id").asc)))
      .filter(col("rn") <= K)
      .collect().groupBy(_.getLong(0))
      .map { case (p, rows) => p -> rows.map(_.getLong(1)).toSet }
    def recallVs(res: DataFrame): Double = {
      val got = res.collect().groupBy(_.getLong(0))
        .map { case (p, rows) => p -> rows.map(_.getLong(2)).toSet }
      truth.map { case (p, t) => got.getOrElse(p, Set.empty).count(t) }
        .sum.toDouble / (truth.size * K)
    }
    val cents = Ann.trainCentroids(labeled, "vec_id", "v", nlist = 10,
      iters = 3)
    val raw = Ann.trainPq(labeled, "vec_id", "v", m = 4, dsub = 16,
      ksub = 8, iters = 2)
    val rRaw = recallVs(Ann.ivfPqSearch(labeled, "vec_id", "v", cProbes,
      cents, "cent_id", "cv", raw, m = 4, dsub = 16, k = K, nprobe = 4))
    val res = Ann.trainPqResidual(labeled, "vec_id", "v", cents,
      "cent_id", "cv", m = 4, dsub = 16, ksub = 8, iters = 2)
    val rRes = recallVs(Ann.ivfPqSearchResidual(labeled, "vec_id", "v",
      cProbes, cents, "cent_id", "cv", res, m = 4, dsub = 16, k = K,
      nprobe = 4))
    info(f"clustered recall@$K%d raw=$rRaw%.3f residual=$rRes%.3f")
    assert(rRes > rRaw,
      f"residual codebook did not improve recall: $rRes%.3f <= $rRaw%.3f")
  }

  test("retrain closes the maintenance loop: drift flags, atomic swap, rebuild parity") {
    import graft.operators.CommitLogTableFormat
    val path = tmpDir("ann-deploy") + "/ivfpq"
    val (m, dsub, ksub) = (4, 16, 8)
    // initial deployment trains on ids >= 200 only
    val initial = corpus.filter(col("vec_id") >= 200)
    // the appended block drifts: one identical far-off vector ×200 —
    // the mass-append pathology that lands in a single cell
    val delta = corpus.filter(col("vec_id") < 200)
      .withColumn("v", transform(col("v"), _ => lit(2.5)))
    val cents0 = Ann.trainCentroids(initial, "vec_id", "v", nlist = 8,
      iters = 2)
    val books0 = Ann.trainPq(initial, "vec_id", "v", m, dsub, ksub, 2)
    val index0 = Ann.ivfPqIndex(initial, "vec_id", "v", cents0,
      "cent_id", "cv", books0, m, dsub)
    Ann.ivfPqPublish(spark, path, index0, cents0, books0)
    assert(CommitLogTableFormat.versions(spark, path) == Seq(1L))
    // O(delta) append against the frozen assets skews occupancy and
    // trips the retrain flag
    val appended = Ann.ivfPqAppend(index0, delta, "vec_id", "v",
      cents0, "cent_id", "cv", books0, m, dsub)
    assert(Ann.ivfCellStats(appended, skewBound = 2.5)
      .filter(col("retrain")).count() >= 1,
      "drifted appends must trip the retrain flag")
    // retrain on the union; ONE commit swaps the whole deployment
    val union = initial.unionByName(delta)
    val (idx, cents, books) = Ann.ivfPqRetrain(spark, path, union,
      "vec_id", "v", nlist = 8, lloydIters = 2, m, dsub, ksub,
      pqIters = 2)
    assert(CommitLogTableFormat.versions(spark, path) == Seq(1L, 2L))
    // retrain-on-union == from-scratch rebuild, down to identical
    // search results (training is deterministic), so recall@10 is BY
    // CONSTRUCTION the rebuild oracle's value
    val centsR = Ann.trainCentroids(union, "vec_id", "v", nlist = 8,
      iters = 2)
    val booksR = Ann.trainPq(union, "vec_id", "v", m, dsub, ksub, 2)
    val indexR = Ann.ivfPqIndex(union, "vec_id", "v", centsR,
      "cent_id", "cv", booksR, m, dsub)
    def hits(i: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      Ann.ivfPqSearchIndexed(i, probes, "vec_id", "v", c, "cent_id",
        "cv", b, m, dsub, k = K, nprobe = 4)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
    val swapped = hits(idx, cents, books)
    assert(swapped == hits(indexR, centsR, booksR),
      "retrained deployment diverged from the from-scratch rebuild")
    // the previous deployment remains whole for in-flight readers
    val v1 = CommitLogTableFormat.readAt(spark, path, 1L).get
    assert(v1.filter(col("kind") === "index").count() == index0.count())
  }
}
