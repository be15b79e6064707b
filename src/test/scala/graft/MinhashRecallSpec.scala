package graft

import graft.operators.NearDup

/** Measured LSH recall for the MinHash banding family — the dedup-side
  * analog of AnnRecallSpec: candidate generation is probabilistic, so
  * its catch rate on true near-dup pairs is MEASURED against local
  * brute-force shingle-Jaccard truth, not assumed. The corpus is
  * deterministic and the minhash permutations are fixed affine maps
  * over md5, so these assertions are exact replays, not flaky
  * samplings. (Precision needs no harness: every candidate passes the
  * exact-Jaccard verify downstream.) */
class MinhashRecallSpec extends SparkSpec {
  import spark.implicits._

  // local truth: same tokenization (split on space) and distinct
  // 3-shingle semantics as TextOps.tokens/shingles3
  private def shingleSet(text: String): Set[String] =
    text.split(" ").sliding(3).filter(_.length == 3)
      .map(_.mkString(" ")).toSet

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty || b.isEmpty) 0.0
    else (a & b).size.toDouble / (a | b).size

  /** 60 namespaced doc pairs (cross-pair Jaccard exactly 0): pair j
    * replaces the last j%6 tokens of a 30-token doc, sweeping true
    * Jaccard 1.0, 27/29, 26/30, 25/31 (≥0.8) down to 24/32, 23/33
    * (below threshold). */
  private val docs: Seq[(Long, String)] = (0 until 60).flatMap { j =>
    val base = (0 until 30).map(t => s"p${j}w$t")
    val m = j % 6
    val variant = base.dropRight(m) ++ (0 until m).map(t => s"p${j}x$t")
    Seq((2L * j, base.mkString(" ")), (2L * j + 1, variant.mkString(" ")))
  }

  private val truth: Set[(Long, Long)] = (0 until 60).flatMap { j =>
    val a = shingleSet(docs(2 * j)._2)
    val b = shingleSet(docs(2 * j + 1)._2)
    if (jaccard(a, b) >= 0.8) Some((2L * j, 2L * j + 1)) else None
  }.toSet

  private def candidates(k: Int, bands: Int): Set[(Long, Long)] = {
    val df = docs.toDF("doc_id", "text")
    NearDup.candidatePairs(
      NearDup.minhashBands(df, "doc_id", "text", k, bands), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("banding recall on J>=0.8 pairs meets the (r=3,b=4) theory floor") {
    // the sweep must actually straddle the threshold
    assert(truth.size == 40)
    val cands = candidates(k = 12, bands = 4)
    val recall = truth.count(cands.contains).toDouble / truth.size
    // theory: catch probability 1-(1-s^3)^4 >= 0.949 at s = 25/31;
    // 0.85 leaves headroom for the unlucky tail of 40 draws
    assert(recall >= 0.85, s"recall $recall below floor")
    // namespaced corpus: a candidate crossing pair namespaces would be
    // a spurious bucket collision — none exist on this fixed corpus
    assert(cands.forall { case (a, b) => a / 2 == b / 2 })
  }

  test("more bands at the same rows-per-band never lose recall") {
    val base = candidates(k = 12, bands = 4)
    val finer = candidates(k = 24, bands = 8)
    val rBase = truth.count(base.contains).toDouble / truth.size
    val rFiner = truth.count(finer.contains).toDouble / truth.size
    assert(rFiner >= rBase,
      s"8-band recall $rFiner dropped below 4-band $rBase")
    // 8 bands at s >= 0.8: catch probability >= 1-(1-0.512)^8 = 0.997
    assert(rFiner >= 0.9)
  }
}
