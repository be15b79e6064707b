package graft

import org.apache.spark.sql.functions._

import graft.operators.EditDistance

class EditDistanceSpec extends SparkSpec {

  private def bruteForce(rows: Seq[(Long, String)], d: Int) = {
    import spark.implicits._
    val df = rows.toDF("id", "k")
    val a = df.select(col("id").as("id_a"), col("k").as("ka"))
    val b = df.select(col("id").as("id_b"), col("k").as("kb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("ka"), col("kb")).cast("long"))
      .filter(col("dist") <= d)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def banded(rows: Seq[(Long, String)], d: Int) = {
    import spark.implicits._
    EditDistance.editDistancePairs(rows.toDF("id", "k"), "id", "k", d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  // roots perturbed by substitutions, insertions, and deletions —
  // variable lengths exercise the partner-length enumeration and the
  // indel shift window, not just same-length substitutions
  private val corpus: Seq[(Long, String)] = {
    val roots = Seq("spark engine corpus", "quantile sketch band",
      "minhash shingle", "zxqw")
    roots.zipWithIndex.flatMap { case (r, i) =>
      val base = i.toLong * 100
      Seq(
        (base + 0, r),
        (base + 1, r.updated(2, '#')),                  // 1 substitution
        (base + 2, r.patch(5, "XY", 0)),                // 2 insertions
        (base + 3, r.patch(1, "", 2)),                  // 2 deletions
        (base + 4, "#" + r.drop(2)),                    // sub + del
        (base + 5, r.reverse))                          // far away
    }
  }

  test("banded pairs == brute-force all-pairs, d = 1..3, mixed edits") {
    for (d <- 1 to 3) {
      val expect = bruteForce(corpus, d)
      val got = banded(corpus, d)
      assert(got === expect, s"d=$d")
      assert(expect.nonEmpty, s"d=$d degenerate fixture")
    }
  }

  test("maxDist 0 degrades to exact-key pairing") {
    val rows = Seq((1L, "same"), (2L, "same"), (3L, "diff"),
      (4L, "same"))
    assert(banded(rows, 0) ===
      Set((1L, 2L, 0L), (1L, 4L, 0L), (2L, 4L, 0L)))
  }

  test("null keys never pair; short keys route through the value-level pass") {
    import spark.implicits._
    // keys shorter than maxDist+1 break the pigeonhole (every char of
    // "ab"/"xy" is substituted, the untouched segment is the empty
    // one) — the dedicated short-key pass must still find them
    val df = Seq((1L, "ab"), (2L, "ab"), (3L, null), (4L, "ba"),
      (5L, "xy"), (6L, ""), (7L, "z"))
      .toDF("id", "k")
    val got = EditDistance.editDistancePairs(df, "id", "k", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === bruteForce(Seq((1L, "ab"), (2L, "ab"), (4L, "ba"),
      (5L, "xy"), (6L, ""), (7L, "z")), 2))
    assert(got.contains((1L, 2L, 0L)))
    assert(got.contains((1L, 5L, 2L)), "short-short pair lost")
    assert(got.contains((6L, 7L, 1L)), "empty-key pair lost")
  }

  test("short x long mixed-length pairs survive; string ids preserved") {
    import spark.implicits._
    // "ab" (short, len 2 < 3) vs "abcd" (long): 2 insertions — the
    // long side's segments pigeonhole, the short side only probes
    val df = Seq(("doc-a", "ab"), ("doc-b", "abcd"), ("doc-c", "zzzz"))
      .toDF("id", "k")
    val got = EditDistance.editDistancePairs(df, "id", "k", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === Set(("doc-a", "doc-b", 2L)))
  }
}
