package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the dimensionality-reduction pass a
  * training corpus runs before clustering/visualisation, and the
  * classic pre-step that shrinks ANN index footprints. The split
  * follows the scale rule every operator here obeys: the CORPUS pass
  * is one distributed scatter-matrix aggregation (map-side partial →
  * one narrow shuffle of ≤ d(d+1)/2 + d + 1 cells per partition,
  * never rows), the EIGENSOLVE runs on the driver over the collected
  * d×d matrix (d = embedding dims, 64 here — microseconds, and
  * independent of corpus size), and the PROJECTION is a row-local
  * codegen'd fold against broadcast-literal basis vectors. 100 TB of
  * embeddings move through exactly one scan + one fixed-size shuffle.
  *
  * Exact-integer moments: every per-row product is floored at 1e-6
  * resolution to a BIGINT before summing, so the aggregation is
  * order-free and the t112 oracle reproduces it bit-for-bit in
  * DuckDB (the pqLloydSql idiom). The ≤1e-6 per-term quantisation
  * shifts eigenvalues by ≤ d·1e-6 — far below the spec'd tolerances.
  */
object Pca {

  /** Scatter-matrix cells, tagged: (i, j, s) with
    *  - i≥0, j≥i : s = Σ floor((x_i·x_j)·1e6)  (upper-triangle scatter)
    *  - i≥0, j=−1: s = Σ floor(x_i·1e6)        (linear sums)
    *  - i=−1,j=−1: s = row count
    * One explode produces the d(d+1)/2 + d + 1 cells per row; Spark's
    * partial aggregation collapses them map-side, so the shuffle
    * carries at most that many cells per input partition. */
  def moments(df: DataFrame, vecCol: String, dims: Int): DataFrame = {
    val xd = VectorOps.asDouble(col(vecCol))
    val pairCells = flatten(transform(sequence(lit(0), lit(dims - 1)), i =>
      transform(sequence(i, lit(dims - 1)), j =>
        struct(i.as("i"), j.as("j"),
          floor(element_at(xd, i + 1) * element_at(xd, j + 1) *
            lit(1000000.0)).cast("long").as("p")))))
    val linCells = transform(sequence(lit(0), lit(dims - 1)), i =>
      struct(i.as("i"), lit(-1).as("j"),
        floor(element_at(xd, i + 1) * lit(1000000.0))
          .cast("long").as("p")))
    val cntCell = array(struct(lit(-1).as("i"), lit(-1).as("j"),
      lit(1L).as("p")))
    df.select(explode(concat(pairCells, linCells, cntCell)).as("c"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(sum(col("c.p")).as("s"))
  }

  final case class Model(dims: Int, n: Long, mean: Array[Double],
      basis: Array[Array[Double]], eigenvalues: Array[Double])

  /** Fit from a [[moments]] frame: collect the bounded cell set
    * (d(d+1)/2 + d + 1 rows — NOT corpus rows), rebuild the mean
    * vector and covariance cov_ij = S_ij/n − μ_i·μ_j, and eigensolve
    * with cyclic Jacobi (symmetric d×d; converges quadratically,
    * sweep cap is a safety net). Returns the top-`r` orthonormal
    * eigenvectors, eigenvalues descending. */
  def fit(moments: DataFrame, dims: Int, r: Int): Model = {
    require(r >= 1 && r <= dims, s"bad component count $r for d=$dims")
    val cells = moments.collect()
      .map(row => (row.getInt(0), row.getInt(1)) -> row.getLong(2)).toMap
    val n = cells((-1, -1))
    require(n > 1, s"pca needs > 1 row, got $n")
    val mean = Array.tabulate(dims)(i => cells((i, -1)) / 1e6 / n)
    val cov = Array.ofDim[Double](dims, dims)
    for (i <- 0 until dims; j <- i until dims) {
      val c = cells((i, j)) / 1e6 / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (vals, vecs) = jacobiEigen(cov, dims)
    val order = vals.zipWithIndex.sortBy(-_._1).map(_._2).take(r)
    Model(dims, n, mean,
      order.map(c => Array.tabulate(dims)(i => vecs(i)(c))),
      order.map(vals))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: rotate
    * away the largest off-diagonal mass sweep by sweep. d=64 → ~8
    * sweeps · 2016 rotations · O(d) each; driver-side microseconds. */
  private def jacobiEigen(a0: Array[Array[Double]],
      d: Int): (Array[Double], Array[Array[Double]]) = {
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val maxSweeps = 48
    var sweep = 0
    var off = offDiag(a, d)
    while (off > 1e-12 && sweep < maxSweeps) {
      for (p <- 0 until d - 1; q <- p + 1 until d
          if math.abs(a(p)(q)) > 1e-15) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
            case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
            case x => x
          }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (k <- 0 until d) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
        }
        for (k <- 0 until d) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
        }
        for (k <- 0 until d) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
        }
      }
      off = offDiag(a, d)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]], d: Int): Double = {
    var s = 0.0
    for (i <- 0 until d - 1; j <- i + 1 until d) s += a(i)(j) * a(i)(j)
    s
  }

  /** Row-local projection onto the model's components: out[c] =
    * (x − μ)·basis_c, a codegen'd sequential fold per component
    * against LITERAL basis arrays (the d×r model broadcasts inside
    * the plan — no join, no shuffle). */
  def project(df: DataFrame, vecCol: String, model: Model,
      outCol: String = "components"): DataFrame = {
    val xd = VectorOps.asDouble(col(vecCol))
    val centered = zip_with(xd, typedLit(model.mean.toSeq),
      (x, m) => x - m)
    val comps = array(model.basis.map(b =>
      VectorOps.dot(centered, typedLit(b.toSeq))): _*)
    df.withColumn(outCol, comps)
  }
}
