package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

/** Driver-side PCA contracts over the distributed moments pass (the
  * moments cells themselves are oracle-gated in t112). */
class PcaSpec extends SparkSpec {

  // deterministic anisotropic cloud: variance concentrated on axis 0,
  // then 1, then noise — closed-form-free but order-known
  private def cloud(n: Int, d: Int) = {
    import spark.implicits._
    (0 until n).map { r =>
      val v = Array.tabulate(d) { i =>
        val base = math.sin(r * 0.7 + i) * 0.01
        if (i == 0) (r % 17 - 8) * 1.0 + base
        else if (i == 1) (r % 5 - 2) * 0.5 + base
        else base
      }.map(_.toFloat)
      (r.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("fit: orthonormal basis, eigenvalues descending, dominant axis found") {
    val d = 8
    // 340 = 17·20 = 5·68: both planted axes cycle evenly, so the
    // dim-0 sample variance is exactly the uniform-17 value 24
    val df = cloud(340, d)
    val m = Pca.fit(Pca.moments(df, "embedding", d), d, r = 3)
    assert(m.n == 340L)
    // eigenvalues descending
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    // basis orthonormal
    for (a <- m.basis.indices; b <- a until m.basis.length) {
      val dot = m.basis(a).zip(m.basis(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"basis($a)·basis($b)=$dot")
    }
    // the top component is the planted dominant axis (dim 0)
    assert(math.abs(m.basis(0)(0)) > 0.99,
      s"top component ${m.basis(0).mkString(",")}")
    // sample variance along dim 0: E[x²]−μ² of (r%17−8) = 24 exactly
    assert(math.abs(m.eigenvalues(0) - 24.0) < 0.2,
      s"top eigenvalue ${m.eigenvalues(0)}")
  }

  test("project: per-component variance equals eigenvalue; projection " +
    "is a no-shuffle plan") {
    val d = 8
    val df = cloud(400, d)
    val m = Pca.fit(Pca.moments(df, "embedding", d), d, r = 2)
    val proj = Pca.project(df, "embedding", m)
    // no Exchange in the projection plan: row-local fold only
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    val stats = proj.select(
      (0 until 2).flatMap(c => Seq(
        avg(element_at(col("components"), c + 1)).as(s"m$c"),
        avg(element_at(col("components"), c + 1) *
          element_at(col("components"), c + 1)).as(s"s$c"))): _*)
      .collect()(0)
    for (c <- 0 until 2) {
      val variance = stats.getDouble(2 * c + 1) -
        math.pow(stats.getDouble(2 * c), 2)
      assert(math.abs(variance - m.eigenvalues(c)) <
        0.01 * math.max(1.0, m.eigenvalues(c)),
        s"component $c variance $variance vs eigenvalue " +
          s"${m.eigenvalues(c)}")
    }
    // components are centred: mean ≈ 0
    assert(math.abs(stats.getDouble(0)) < 1e-6)
  }

  test("reconstruction error shrinks as components grow, hits ~0 at full rank") {
    val d = 6
    val df = cloud(300, d)
    val moments = Pca.moments(df, "embedding", d)
    def recon(r: Int): Double = {
      val m = Pca.fit(moments, d, r)
      val proj = Pca.project(df, "embedding", m)
      // ||x−μ||² − Σ comp² summed over rows = residual energy
      val row = proj.select(
        sum(graft.functions.VectorOps.norm2(zip_with(
          graft.functions.VectorOps.asDouble(col("embedding")),
          typedLit(m.mean.toSeq), (x, mu) => x - mu))).as("tot"),
        sum(graft.functions.VectorOps.norm2(col("components")))
          .as("kept")).collect()(0)
      row.getDouble(0) - row.getDouble(1)
    }
    val errs = (1 to d).map(recon)
    assert(errs.sliding(2).forall(p => p(0) >= p(1) - 1e-6),
      s"residual energy must be monotone non-increasing: $errs")
    assert(errs.last < 1e-4 * (1 + errs.head),
      s"full-rank residual ${errs.last} (total ${errs.head})")
  }
}
