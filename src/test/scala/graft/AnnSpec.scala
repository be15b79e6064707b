package graft

import graft.functions.VectorOps
import graft.operators.Ann
import org.apache.spark.sql.functions._

/** Ann.trainCentroids properties: Lloyd convergence (objective
  * non-increasing), determinism across runs, empty-cell retention,
  * and the trained-centroid search contract. */
class AnnSpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    // two well-separated blobs around (0,0,...) and (10,10,...), plus a
    // far outlier so one seed centroid captures a singleton
    val rows = (0L until 40L).map { i =>
      val base = if (i < 20) 0.0 else 10.0
      // deterministic jitter, no RNG
      val v = (0 until 8).map(d => base + ((i * 7 + d * 3) % 5) * 0.1)
      (i, v)
    } :+ (40L, (0 until 8).map(_ => 100.0).toSeq.map(_.toDouble))
    rows.toDF("id", "v")
  }

  test("trainCentroids: k-means objective is non-increasing per iteration") {
    val objectives = (0 to 3).map { it =>
      val c = Ann.trainCentroids(vecs, "id", "v", nlist = 3, iters = it)
      Ann.kmeansObjective(vecs, "id", "v", c)
    }
    objectives.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"objective increased: $objectives")
    }
    // and training actually helps on this corpus: seeds are all in the
    // first blob, trained centroids split the blobs
    assert(objectives.last < objectives.head)
  }

  test("trainCentroids: deterministic across runs and partitionings") {
    val a = Ann.trainCentroids(vecs, "id", "v", 3, 2).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    val b = Ann.trainCentroids(vecs.repartition(7), "id", "v", 3, 2)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("trainCentroids: a cell that captures nothing keeps its centroid") {
    import spark.implicits._
    // all mass at one point; 3 seed centroids, two go empty after the
    // first assignment collapses everything onto the nearest seed
    val pts = (0L until 10L).map(i => (i, Seq(5.0, 5.0))).toDF("id", "v")
    val trained = Ann.trainCentroids(pts, "id", "v", nlist = 1, iters = 2)
    assert(trained.count() == 1)
    val allSame = Ann.trainCentroids(pts, "id", "v", nlist = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    // every vector is equidistant; tie-break assigns all to cent_id 0,
    // which moves to the mass point; 1 and 2 keep their init positions
    assert(allSame(0L) == Seq(5.0, 5.0))
    assert(allSame(1L) == Seq(5.0, 5.0)) // init WAS the mass point
    assert(allSame(2L) == Seq(5.0, 5.0))
  }

  test("trainPq: per-subspace objective non-increasing, deterministic") {
    // PQ objective = sum over subspaces of within-code squared error;
    // each subspace is an independent k-means, so Lloyd monotonicity
    // holds for the sum
    def objective(iters: Int): Double = {
      val books = Ann.trainPq(vecs, "id", "v", m = 2, dsub = 4,
        ksub = 3, iters = iters)
      val subs = vecs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(1)),
          s => slice(col("v"), s * 4 + 1, lit(4)))).as(Seq("sub", "sv")))
      val assigned = Ann.pqAssign(vecs, "id", "v", books, m = 2, dsub = 4)
      subs.join(assigned, Seq("id", "sub"))
        .join(books, Seq("sub", "code"))
        .select(VectorOps.norm2(zip_with(col("sv"), col("cv"),
          (x, y) => x - y)).cast("decimal(28,10)").as("d2"))
        .agg(sum("d2").cast("double")).collect()(0).getDouble(0)
    }
    val objectives = (0 to 3).map(objective)
    objectives.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"objective increased: $objectives")
    }
    assert(objectives.last < objectives.head)
    // determinism across partitionings
    val a = Ann.trainPq(vecs, "id", "v", 2, 4, 3, 2).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2))
    val b = Ann.trainPq(vecs.repartition(7), "id", "v", 2, 4, 3, 2)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2))
    assert(a.toSeq == b.toSeq)
  }

  test("pqEncode + pqSearchAdc: ADC top-1 finds the same-blob neighbors") {
    val books = Ann.trainPq(vecs, "id", "v", m = 2, dsub = 4,
      ksub = 4, iters = 3)
    val codes = Ann.pqEncode(vecs, "id", "v", books, m = 2, dsub = 4)
    assert(codes.count() == 41)
    // every code vector has m entries within [0, ksub)
    val bad = codes.filter(size(col("codes")) =!= 2 ||
      exists(col("codes"), c => c < 0 || c >= 4)).count()
    assert(bad == 0)
    val probes = vecs.filter(col("id").isin(0L, 25L))
    val res = Ann.pqSearchAdc(codes, "id", probes, "id", "v", books,
      m = 2, dsub = 4, k = 5).collect()
    assert(res.length == 10)
    // with well-separated blobs, every ADC neighbor of a probe comes
    // from the probe's own blob (codewords separate the blobs)
    res.foreach { r =>
      val (p, c) = (r.getLong(0), r.getLong(2))
      if (p < 20) assert(c < 20, s"probe $p matched cross-blob $c")
      else assert(c >= 20 && c < 41, s"probe $p matched cross-blob $c")
    }
    // ad2 non-decreasing in rank for each probe
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(byRank == byRank.sorted)
    }
  }

  test("ivfPqSearch: probing every cell degenerates to plain ADC search") {
    val cents = Ann.trainCentroids(vecs, "id", "v", nlist = 3, iters = 2)
    val books = Ann.trainPq(vecs, "id", "v", m = 2, dsub = 4,
      ksub = 4, iters = 2)
    val codes = Ann.pqEncode(vecs, "id", "v", books, m = 2, dsub = 4)
    val probes = vecs.filter(col("id").isin(0L, 25L))
    val full = Ann.pqSearchAdc(codes, "id", probes, "id", "v", books,
      m = 2, dsub = 4, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val ivfpq = Ann.ivfPqSearch(vecs, "id", "v", probes, cents,
      "cent_id", "cv", books, m = 2, dsub = 4, k = 3, nprobe = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(ivfpq == full)
    // and with nprobe=1 every candidate comes from the probe's own cell
    val pruned = Ann.ivfPqSearch(vecs, "id", "v", probes, cents,
      "cent_id", "cv", books, m = 2, dsub = 4, k = 3, nprobe = 1)
    val cellOf = Ann.ivfAssignCells(vecs, "id", "v", cents, "cent_id",
      "cv").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pruned.collect().foreach { r =>
      assert(cellOf(r.getLong(2)) == cellOf(r.getLong(0)),
        s"candidate ${r.getLong(2)} outside probe ${r.getLong(0)}'s cell")
    }
  }

  test("ivfPqAppend: append-then-search == rebuild-then-search, cell stats flag drift") {
    // frozen assets train on the EXISTING half only; the delta is
    // append-encoded against them. Search over the appended index must
    // equal search over a from-scratch rebuild of the union — the
    // contract that makes O(delta) daily maintenance safe.
    val existing = vecs.filter(col("id") % 2 === 0)
    val delta = vecs.filter(col("id") % 2 === 1)
    val cents = Ann.trainCentroids(existing, "id", "v", nlist = 3, iters = 2)
    val books = Ann.trainPq(existing, "id", "v", m = 2, dsub = 4,
      ksub = 4, iters = 2)
    val probes = vecs.filter(col("id").isin(0L, 25L))
    def collectSearch(index: org.apache.spark.sql.DataFrame) =
      Ann.ivfPqSearchIndexed(index, probes, "id", "v", cents, "cent_id",
        "cv", books, m = 2, dsub = 4, k = 3, nprobe = 3).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val appended = Ann.ivfPqAppend(
      Ann.ivfPqIndex(existing, "id", "v", cents, "cent_id", "cv", books, 2, 4),
      delta, "id", "v", cents, "cent_id", "cv", books, 2, 4)
    val rebuilt = Ann.ivfPqIndex(vecs, "id", "v", cents, "cent_id", "cv",
      books, 2, 4)
    assert(collectSearch(appended) == collectSearch(rebuilt))
    // index rows: every corpus vector exactly once after append
    assert(appended.select("c_id").distinct().count() == vecs.count())

    // cell stats: balanced occupancy does not flag; a drifted append
    // (everything lands in one cell) does
    val stats = Ann.ivfCellStats(appended, skewBound = 2.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    assert(stats.map(_._2).sum == vecs.count())
    val skewed = Ann.ivfCellStats(
      appended.withColumn("cell", lit(0L)), skewBound = 2.0)
    assert(skewed.count() == 1 && !skewed.collect()(0).getBoolean(3),
      "a single-cell index has skew 1.0, not a retrain flag")
    // hand-built skew: 9 rows in cell 0, 1 in cell 1 -> avg 5,
    // skew 1.8 / 0.2 -> only the hot cell flags at bound 1.5
    import spark.implicits._
    val toy = (0 until 9).map(i => (i.toLong, 0L, Seq(0, 0)))
      .:+((9L, 1L, Seq(0, 0))).toDF("c_id", "cell", "codes")
    val toyStats = Ann.ivfCellStats(toy, skewBound = 1.5).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(toyStats == Map(0L -> true, 1L -> false))
  }

  test("ivfSearch on trained centroids returns exact top-k inside cells") {
    val cents = Ann.trainCentroids(vecs, "id", "v", nlist = 2, iters = 2)
    val probes = vecs.filter(col("id") === 0L)
    val res = Ann.ivfSearch(vecs, "id", "v", probes, cents, "cent_id",
      "cv", k = 3, nprobe = 1).collect()
    assert(res.length == 3)
    // all results must come from the probe's own blob (ids < 20), and
    // ranks are contiguous with descending cosine
    assert(res.forall(_.getLong(2) < 20L))
    val byRank = res.sortBy(_.getInt(1))
    assert(byRank.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    val cosines = byRank.map(_.getDouble(3)).toSeq
    assert(cosines == cosines.sorted.reverse)
  }
}
