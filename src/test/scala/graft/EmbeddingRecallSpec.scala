package graft

import graft.operators.NearDup

/** Measured SRP-LSH recall for the embedding near-dup family — the
  * vector-space sibling of MinhashRecallSpec: sign-random-projection
  * banding is probabilistic (per-plane collision 1 − θ/π), so its
  * catch rate on true cosine ≥ 0.9 pairs is MEASURED against the
  * exact cosines of a controlled-angle corpus. Hyperplanes
  * (VectorOps.lshWeight) and the corpus are deterministic, so the
  * assertions replay exactly. Cross-pair collisions DO occur here
  * (unlike the namespaced shingle corpus) — that is the designed
  * false-positive load the exact-cosine verify prunes. */
class EmbeddingRecallSpec extends SparkSpec {
  import spark.implicits._

  private val Dims = 16
  // per-pair angle sweep: cosines 1.0, 0.980, 0.955, 0.921, 0.900
  // (truth at tau = 0.9) and 0.765 (below threshold)
  private val Angles = Seq(0.0, 0.2, 0.3, 0.4, 0.45, 0.7)

  private def unit(rnd: scala.util.Random): Array[Double] = {
    val v = Array.fill(Dims)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  /** 60 pairs (2j, 2j+1): v' = cos(θ)v + sin(θ)u with u ⊥ v, so
    * cos(v, v') = cos(θ) exactly (up to float rounding). */
  private val vecs: Seq[(Long, Seq[Float])] = (0 until 60).flatMap { j =>
    val rnd = new scala.util.Random(1000 + j)
    val v = unit(rnd)
    val g = unit(rnd)
    val proj = (0 until Dims).map(i => v(i) * g(i)).sum
    val uRaw = (0 until Dims).map(i => g(i) - proj * v(i)).toArray
    val un = math.sqrt(uRaw.map(x => x * x).sum)
    val u = uRaw.map(_ / un)
    val th = Angles(j % Angles.size)
    val w = (0 until Dims)
      .map(i => math.cos(th) * v(i) + math.sin(th) * u(i))
    Seq((2L * j, v.map(_.toFloat).toSeq),
      (2L * j + 1, w.map(_.toFloat).toSeq))
  }

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = (a, b).zipped.map(_.toDouble * _.toDouble).sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    dot / (na * nb)
  }

  private val truth: Set[(Long, Long)] = (0 until 60).flatMap { j =>
    if (cosine(vecs(2 * j)._2, vecs(2 * j + 1)._2) >= 0.9)
      Some((2L * j, 2L * j + 1))
    else None
  }.toSet

  private def candidates(tables: Int): Set[(Long, Long)] = {
    val df = vecs.toDF("vec_id", "v")
    NearDup.candidatePairs(
      NearDup.embeddingBands(df, "vec_id", "v", Dims, tables,
        planesPerTable = 4), "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("SRP recall on cosine>=0.9 pairs meets the 4-table theory floor") {
    assert(truth.size == 50) // five of six sweep angles qualify
    val cands = candidates(tables = 4)
    val recall = truth.count(cands.contains).toDouble / truth.size
    // theory at cos 0.9 (θ = 0.451): per-table (1-θ/π)^4 = 0.537,
    // catch 1-(1-0.537)^4 = 0.954; identical pairs are certain
    assert(recall >= 0.85, s"recall $recall below floor")
  }

  test("more SRP tables never lose recall") {
    val r4 = truth.count(candidates(4).contains).toDouble / truth.size
    val r8 = truth.count(candidates(8).contains).toDouble / truth.size
    assert(r8 >= r4, s"8-table recall $r8 dropped below 4-table $r4")
    assert(r8 >= 0.9) // theory 0.998 at the threshold angle
  }
}
