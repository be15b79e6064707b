package graft

import graft.operators.NearDup

/** Measured recall for the containment hot-gram cap — the containment
  * sibling of MinhashRecallSpec. The `maxDf` guard is PROVED
  * conservative (capped containment is a lower bound, so guard-on
  * dedup keeps a superset of exact survivors); what it does not give
  * for free is how MANY true pairs the cap hides when overlap mass
  * sits in hot grams. This suite measures that on a Zipf-shingled
  * corpus — the df profile a real web-scale crawl has, where a thick
  * band of templated grams sits between "rare" and "capped" — against
  * brute-force directional ground truth, and pins floors.
  *
  * (The witness-path CANDIDATE stage needs no recall harness: its
  * rarest-probe pigeonhole is complete by construction —
  * ContainmentWitnessSpec asserts output equality with the
  * pair-materializing path, and t101/t144 gate both against one
  * oracle.)
  */
class ContainmentRecallSpec extends SparkSpec {
  import spark.implicits._

  // Zipf token draw: token ids ~ rank^-1 over a 400-word vocabulary,
  // deterministic LCG so the corpus is a replay, not a sampling
  private def zipfCorpus(nDocs: Int, docLen: Int): Seq[(Long, String)] = {
    val vocab = 400
    val weights = (1 to vocab).map(r => 1.0 / r)
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    var state = 0x9e3779b97f4a7c15L
    def nextTok(): String = {
      state = state * 6364136223846793005L + 1442695040888963407L
      val u = ((state >>> 11).toDouble / (1L << 53).toDouble) * total
      val idx = cum.indexWhere(_ >= u)
      s"z${if (idx < 0) vocab - 1 else idx}"
    }
    (0 until nDocs).map { i =>
      (i.toLong, (0 until docLen).map(_ => nextTok()).mkString(" "))
    }
  }

  private def shingles(text: String): Set[String] =
    text.split(" ").sliding(3).filter(_.length == 3)
      .map(_.mkString(" ")).toSet

  // corpus: 300 Zipf docs + planted excerpts of every 4th (first 60%
  // of tokens — true containment 1.0 into the source) so ground
  // truth has both natural near-pairs and guaranteed excerpt pairs
  private lazy val corpus: Seq[(Long, String)] = {
    val base = zipfCorpus(300, 40)
    val planted = base.collect { case (id, t) if id % 4 == 0 =>
      (10000L + id, t.split(" ").take(24).mkString(" "))
    }
    base ++ planted
  }

  /** Brute-force directional truth at tau under a df cap (cap =
    * Int.MaxValue → exhaustive): pairs (a < b) where either side's
    * capped containment reaches tau — exactly containmentPairs'
    * keep condition. */
  private def truth(tau: Double, cap: Int): Set[(Long, Long)] = {
    val sh = corpus.map { case (id, t) => (id, shingles(t)) }
      .filter(_._2.nonEmpty)
    val df = sh.flatMap(_._2).groupBy(identity).map { case (g, xs) =>
      (g, xs.size)
    }
    val kept = sh.map { case (id, s) =>
      (id, s, s.filter(g => df(g) <= cap))
    }
    (for {
      (ida, sa, ka) <- kept
      (idb, sb, kb) <- kept
      if ida < idb
      inter = (ka & kb).size
      if inter > 0
      ca = BigDecimal(inter.toDouble / sa.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      cb = BigDecimal(inter.toDouble / sb.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if ca >= tau || cb >= tau
    } yield (ida, idb)).toSet
  }

  private def engine(tau: Double, cap: Int): Set[(Long, Long)] =
    NearDup.containmentPairs(corpus.toDF("doc_id", "text"),
      "doc_id", "text", tau, maxDf = cap)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("capped engine pairs equal capped brute-force truth (the cap " +
      "is a semantics, not an approximation of itself)") {
    for (cap <- Seq(8, 20, 64)) {
      val e = engine(0.9, cap)
      val t = truth(0.9, cap)
      assert(e == t, s"cap=$cap engine ${e.size} != truth ${t.size}")
    }
  }

  test("recall of capped pairs vs EXHAUSTIVE truth: measured, floored") {
    val exact = truth(0.9, Int.MaxValue)
    assert(exact.nonEmpty, "fixture must have true tau-pairs")
    // planted excerpt pairs are the recall-critical subset
    val planted = exact.filter { case (a, b) => b >= 10000L || a >= 10000L }
    assert(planted.size >= 60)
    for ((cap, floor) <- Seq((64, 1.0), (20, 0.95), (8, 0.6))) {
      val capped = engine(0.9, cap)
      // conservative: never a pair the exhaustive run lacks
      assert((capped -- exact).isEmpty, s"cap=$cap fabricated pairs")
      val recall = (capped & exact).size.toDouble / exact.size
      assert(recall >= floor,
        f"cap=$cap recall $recall%.3f below floor $floor " +
          s"(${(exact -- capped).size} of ${exact.size} pairs hidden)")
    }
  }

  test("dedup survivors under the cap are a superset of exact " +
      "survivors (the documented one-sided guarantee)") {
    val df = corpus.toDF("doc_id", "text")
    val exact = NearDup.dedupByContainment(df, "doc_id", "text", 0.9,
      maxDf = NearDup.ContainmentExhaustive)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    for (cap <- Seq(8, 20, 64)) {
      val capped = NearDup.dedupByContainment(df, "doc_id", "text",
        0.9, maxDf = cap)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(exact.subsetOf(capped),
        s"cap=$cap dropped a doc the exact run kept")
    }
  }
}
