package graft

import graft.functions.VectorOps
import graft.operators.Ann
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r12-optimization parity pin: the row-local assignment kernels
  * (expressions.NearestCell / PqCodes behind Ann.ivfAssignCells,
  * ivfAssign, pqAssign, pqEncode) must reproduce the pre-r12
  * crossJoin → min(struct(d2, id)) plan BIT FOR BIT — same sequential
  * widened distance fold, same (d2 asc, id asc) tie-break. The join
  * forms are re-stated inline here as the reference. */
class AnnAssignParitySpec extends SparkSpec {

  // deterministic corpus with engineered distance TIES: coordinates
  // are small multiples of 0.25 (exact binary fractions), several
  // vectors equidistant to two centroids
  private def corpus = {
    import spark.implicits._
    (0L until 60L).map { i =>
      val v = (0 until 8).map(d => ((i * 5 + d * 3) % 9) * 0.25)
      (i, v)
    }.toDF("id", "v")
  }

  private def cents = {
    import spark.implicits._
    // includes two IDENTICAL centroids (3 and 4): every vector ties
    // between them and must assign to id 3
    Seq(
      (1L, Seq(0.0, 0.25, 0.5, 0.75, 1.0, 1.25, 1.5, 1.75)),
      (2L, Seq(2.0, 1.75, 1.5, 1.25, 1.0, 0.75, 0.5, 0.25)),
      (3L, Seq(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)),
      (4L, Seq(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)))
      .toDF("cent_id", "cv")
  }

  /** Pre-r12 reference: broadcast crossJoin + min(struct) argmin. */
  private def joinAssignCells(vectors: DataFrame): DataFrame = {
    val d2 = VectorOps.sqDist(col("v"), col("cv"))
    vectors.crossJoin(broadcast(cents))
      .groupBy(col("id"))
      .agg(min(struct(d2.as("d2"), col("cent_id").as("cell"))).as("__b"))
      .select(col("id"), col("__b.cell").as("cell"), col("__b.d2").as("d2"))
  }

  test("ivfAssignCells == crossJoin argmin, ties to the smallest id") {
    val got = Ann.ivfAssignCells(corpus, "id", "v", cents, "cent_id", "cv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val want = joinAssignCells(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got == want)
    // the identical-centroid tie must have resolved to id 3, never 4
    assert(got.forall(_._2 != 4L))
    assert(got.exists(_._2 == 3L))
  }

  test("ivfAssign carries the vector through unchanged") {
    val got = Ann.ivfAssign(corpus, "id", "v", cents, "cent_id", "cv")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val cells = joinAssignCells(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vsrc = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got.map(_._1) == (0L until 60L))
    got.foreach { case (id, v, cell) =>
      assert(v == vsrc(id) && cell == cells(id))
    }
  }

  test("float vectors widen per element exactly like the kernel fold") {
    import spark.implicits._
    // 0.1f is NOT an exact binary fraction: float-widened and
    // double-native distances differ, so this catches a wrong
    // widening order
    val fvecs = (0L until 20L).map { i =>
      (i, (0 until 8).map(d => ((i + d) % 7).toFloat * 0.1f))
    }.toDF("id", "vf")
      .select(col("id"), col("vf").cast("array<float>").as("v"))
    val got = Ann.ivfAssignCells(fvecs, "id", "v", cents, "cent_id", "cv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val d2 = VectorOps.sqDist(col("v"), col("cv"))
    val want = fvecs.crossJoin(broadcast(cents))
      .groupBy(col("id"))
      .agg(min(struct(d2.as("d2"), col("cent_id").as("cell"))).as("__b"))
      .select(col("id"), col("__b.cell"), col("__b.d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got == want)
  }

  test("pqAssign / pqEncode == explode + broadcast-join argmin") {
    import spark.implicits._
    val (m, dsub) = (2, 4)
    val books = Ann.trainPq(corpus, "id", "v", m, dsub, ksub = 3,
      iters = 2)
    // reference: the pre-r12 explode/join/argmin pipeline
    val subs = corpus.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(col("v"), s * dsub + 1, lit(dsub)))).as(Seq("sub", "sv")))
    val d2 = VectorOps.sqDist(col("sv"), col("cv"))
    val want = subs
      .join(broadcast(books.select(col("sub"), col("code"), col("cv"))),
        Seq("sub"))
      .groupBy(col("id"), col("sub"))
      .agg(min(struct(d2.as("d2"), col("code").as("code"))).as("__b"))
      .select(col("id"), col("sub"), col("__b.code").as("code"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val got = Ann.pqAssign(corpus, "id", "v", books, m, dsub)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == want)
    val codes = Ann.pqEncode(corpus, "id", "v", books, m, dsub)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    want.groupBy(_._1).foreach { case (id, rows) =>
      assert(codes(id) == rows.sortBy(_._2).map(_._3))
    }
  }

  test("assignment plans are exchange-free (the point of the rewrite)") {
    val assigned = Ann.ivfAssign(
      spark.range(100).select(col("id"),
        transform(sequence(lit(0), lit(7)),
          d => (col("id") % 9).cast("double") * 0.25).as("v")),
      "id", "v", cents, "cent_id", "cv")
    assigned.count() // finalize AQE
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
    assert(plan.contains("nearest_cell"), plan.take(500))
  }
}
