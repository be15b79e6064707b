package graft

import graft.operators.{Ann, Decontam}
import org.apache.spark.sql.functions._

/** Decontam: exact/IVF agreement, pruning is conservative, and the
  * combined report catches paraphrase-style leakage n-grams miss. */
class DecontamSpec extends SparkSpec {

  private def vec(seed: Int, dims: Int = 8): Seq[Double] =
    (0 until dims).map(d =>
      math.sin(seed * 37.0 + d * 11.0) + (if (seed % 3 == 0) 2.0 else -2.0))

  private def corpus = {
    import spark.implicits._
    (0 until 60).map(i => (i.toLong, vec(i))).toDF("id", "v")
  }

  test("ivf variant at nprobe = nlist equals the exact variant") {
    val c = corpus.filter(col("id") % 10 =!= 0)
    val b = corpus.filter(col("id") % 10 === 0).select(col("v"))
    val cents = Ann.trainCentroids(corpus, "id", "v", nlist = 4, iters = 2)
    val exact = Decontam.embeddingContamination(c, "id", "v", b, "v", 0.9)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    val ivf = Decontam.embeddingContaminationIvf(c, "id", "v", b, "v",
      0.9, cents, "cent_id", "cv", nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    assert(ivf == exact)
  }

  test("ivf pruning is conservative: scores never exceed exact") {
    val c = corpus.filter(col("id") % 10 =!= 0)
    val b = corpus.filter(col("id") % 10 === 0).select(col("v"))
    val cents = Ann.trainCentroids(corpus, "id", "v", nlist = 4, iters = 2)
    val exact = Decontam.embeddingContamination(c, "id", "v", b, "v", 0.9)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pruned = Decontam.embeddingContaminationIvf(c, "id", "v", b, "v",
      0.9, cents, "cent_id", "cv", nprobe = 1)
      .collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getBoolean(2)))
    pruned.foreach { case (id, cosOpt, flagged) =>
      cosOpt.foreach(cos => assert(cos <= exact(id) + 1e-9,
        s"id=$id pruned max $cos above exact ${exact(id)}"))
      if (flagged) // a pruned flag must be a real (exact) flag
        assert(exact(id) >= 0.9)
    }
    // the two-lobe corpus clusters cleanly: nprobe=1 still finds the
    // same-lobe nearest bench vector for most docs
    val agree = pruned.count { case (id, _, f) => f == (exact(id) >= 0.9) }
    assert(agree >= pruned.length * 0.8,
      s"nprobe=1 agreement $agree/${pruned.length}")
  }

  test("fullReport: embedding catches the paraphrase n-grams miss") {
    import spark.implicits._
    val benchText = "the quick brown fox jumps over the lazy dog today"
    val paraText = "a speedy umber vulpine leaps across an idle hound now"
    val spanText = "the quick brown fox jumps over the lazy dog " +
      "completely different tail of words follows here"
    val e1 = (0 until 8).map(_.toDouble) // == bench embedding
    val far = (0 until 8).map(d => if (d % 2 == 0) -5.0 else 5.0)
    val docs = Seq(
      (1L, paraText, e1), // paraphrase: embedding hit, no shared spans
      (2L, spanText, far), // span copy: n-gram hit, embedding far
      (3L, "entirely unrelated content about parquet shuffles", far))
      .toDF("id", "text", "v")
    val bench = Seq((benchText, e1)).toDF("text", "v")
    val rep = Decontam.fullReport(docs, "id", "text", "v",
      bench, "text", "v", n = 5, threshold = 0.95)
      .select("id", "n_contaminated", "embedding_contaminated",
        "contaminated")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(rep(1L)._1 == 0 && rep(1L)._2, "paraphrase should flag only via embedding")
    assert(rep(2L)._1 > 0 && !rep(2L)._2, "span copy should flag only via n-grams")
    assert(rep(1L)._3 && rep(2L)._3 && !rep(3L)._3)
  }
}
