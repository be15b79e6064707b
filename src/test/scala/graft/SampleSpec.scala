package graft

import graft.operators.Sample
import org.apache.spark.sql.functions._

/** Sample properties: partitioning-independence, cross-table
  * coordination, split disjointness/coverage, salt independence. */
class SampleSpec extends SparkSpec {

  private def ids = {
    import spark.implicits._
    (0L until 2000L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "stratum")
  }

  test("hashSample: deterministic and partitioning-independent") {
    val a = Sample.hashSample(ids, "id", 0.3).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Sample.hashSample(ids.repartition(17), "id", 0.3).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    // rate is approximately honored (md5 buckets are uniform)
    assert(math.abs(a.size - 600) < 120, s"got ${a.size} of 2000 at 0.3")
  }

  test("hashSample: the same (salt, id) decision coordinates across tables") {
    import spark.implicits._
    val other = (0L until 2000L).map(i => (i, s"payload$i"))
      .toDF("id", "payload")
    val a = Sample.hashSample(ids, "id", 0.25, "s1").select("id")
      .collect().map(_.getLong(0)).toSet
    val b = Sample.hashSample(other, "id", 0.25, "s1").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // and a different salt draws a genuinely different sample
    val c = Sample.hashSample(ids, "id", 0.25, "s2").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(a != c)
  }

  test("stratifiedSample: per-stratum rates, absent strata drop") {
    val out = Sample.stratifiedSample(ids, "id", "stratum",
      Map("a" -> 1.0), "s")
    val strata = out.select("stratum").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(strata == Seq("a")) // b absent from map => dropped
    assert(out.count() == ids.filter(col("stratum") === "a").count())
  }

  test("sampleToTokenBudget: ~budget tokens kept per stratum, clamp, drop") {
    import spark.implicits._
    val docs = (0L until 3000L)
      .map(i => (i, if (i % 3 == 0) "big" else if (i % 3 == 1) "small"
        else "unbudgeted", 100L))
      .toDF("id", "stratum", "n_tokens")
    // big: 100k tokens total, budget 20k => ~20% kept
    // small: 100k total, budget 1B => clamp, ALL kept
    // unbudgeted: absent => dropped
    val out = graft.operators.Sample.sampleToTokenBudget(docs, "id",
      "stratum", "n_tokens", Map("big" -> 20000L, "small" -> 1000000000L))
    val kept = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("unbudgeted"))
    assert(kept("small") == 1000L) // clamp keeps every row
    val bigTokens = kept("big") * 100L
    assert(bigTokens > 10000L && bigTokens < 30000L,
      s"big stratum sampled to $bigTokens tokens for a 20k budget")
    // deterministic across partitionings
    val again = graft.operators.Sample.sampleToTokenBudget(
      docs.repartition(13), "id", "stratum", "n_tokens",
      Map("big" -> 20000L, "small" -> 1000000000L))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("hashSplit: splits are disjoint, exhaustive over bounds, stable") {
    val out = Sample.hashSplit(ids, "id", Seq(0.5, 0.3, 0.2), "sp")
    assert(out.count() == 2000)
    // sum to 1.0 => no -1 remainder
    assert(out.filter(col("split") === -1).count() == 0)
    val sizes = out.groupBy("split").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(0, 1, 2))
    assert(math.abs(sizes(0) - 1000L) < 150)
    // under-allocated fractions leave a -1 remainder
    val rem = Sample.hashSplit(ids, "id", Seq(0.1), "sp")
    assert(rem.filter(col("split") === -1).count() > 0)
    // a row's split never depends on partitioning
    val a = out.select("id", "split").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val b = Sample.hashSplit(ids.repartition(13), "id",
      Seq(0.5, 0.3, 0.2), "sp").select("id", "split").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(a == b)
  }

  test("temperatureMixture: alpha=1 is proportional, small alpha flattens") {
    import spark.implicits._
    // big stratum: 1800 docs x 100 tokens; small: 200 x 100
    val docs = (0L until 2000L)
      .map(i => (i, if (i < 1800) "big" else "small", 100L))
      .toDF("id", "stratum", "n")
    def kept(alpha: Double, budget: Long): Map[String, Long] =
      Sample.temperatureMixture(docs, "id", "stratum", "n", alpha, budget)
        .groupBy("stratum").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    // alpha=1: budget shares follow natural proportions, so BOTH
    // strata thin by the same rate budget/total = 50%
    val nat = kept(1.0, 100000L)
    assert(math.abs(nat("big") / 1800.0 - 0.5) < 0.08, nat.toString)
    assert(math.abs(nat("small") / 200.0 - 0.5) < 0.12, nat.toString)
    // alpha=0.25 pushes shares toward uniform: the small stratum's
    // sampling rate must now exceed the big one's
    val flat = kept(0.25, 100000L)
    assert(flat("small") / 200.0 > flat("big") / 1800.0 + 0.2,
      flat.toString)
    // deterministic under repartition
    val again = Sample.temperatureMixture(docs.repartition(13), "id",
      "stratum", "n", 0.25, 100000L).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(again == Sample.temperatureMixture(docs, "id", "stratum",
      "n", 0.25, 100000L).select("id")
      .collect().map(_.getLong(0)).toSet)
  }

  test("splitBounds: integer accumulation leaves no float-dust gap") {
    // 0.5+0.3+0.2 accumulates to 0.9999999999999999 as doubles; a
    // truncated cumulative sum would end at 999999 and orphan the top
    // bucket. The integer-space bounds snap the final bound to 10^6.
    assert(Sample.splitBounds(Seq(0.5, 0.3, 0.2)) ==
      Seq(0L, 500000L, 800000L, 1000000L))
    // sums meaningfully below 1 keep a genuine remainder range
    assert(Sample.splitBounds(Seq(0.1, 0.2)) == Seq(0L, 100000L, 300000L))
    // every bucket in [0, 10^6) is assigned when fractions sum to 1:
    // probe the exact top bucket id rather than trusting 2000 draws
    val bounds = Sample.splitBounds(Seq(1.0 / 3, 1.0 / 3, 1.0 / 3))
    assert(bounds.last == Sample.Buckets,
      s"top bound ${bounds.last} leaves buckets unassigned")
  }

  test("leakageSafeSplit: a duplicate family never straddles splits") {
    import spark.implicits._
    val dup = "the quick brown fox jumps over the lazy dog every day"
    val docs = (Seq((1L, dup), (2L, dup), (3L, dup)) ++
      (10L to 40L).map(i =>
        (i, (1L to 12L).map(j => s"w${(i * 7 + j * 3) % 23}")
          .mkString(" "))))
      .toDF("doc_id", "text")
    val out = Sample.leakageSafeSplit(docs, "doc_id", "text",
      Seq(0.5, 0.5))
    val rows = out.select("doc_id", "component", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // the family shares its min-id component AND its split decision
    assert(Seq(1L, 2L, 3L).map(rows(_)._1).toSet == Set(1L))
    assert(Seq(1L, 2L, 3L).map(rows(_)._2).toSet.size == 1)
    // all rows present, all assigned (fractions sum to 1)
    assert(rows.size == 34 && rows.values.forall(_._2 >= 0))
    // input columns preserved alongside (component, split)
    assert(out.columns.toSet ==
      Set("doc_id", "text", "component", "split"))
  }

  test("capPerGroup: exact hash-ranked top-cap per group, skew-proof") {
    import spark.implicits._
    // skewed: group "big" has 500 rows, "small" has 3 (under cap)
    val df = ((0L until 500L).map(i => (i, "big")) ++
      Seq((1000L, "small"), (1001L, "small"), (1002L, "small")))
      .toDF("id", "grp")
    val out = Sample.capPerGroup(df, "grp", "id", cap = 10, lanes = 4)
      .collect().map(r => r.getString(1) -> r.getLong(0))
    val bySrc = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // under-cap group keeps everything
    assert(bySrc("small") == Set(1000L, 1001L, 1002L))
    // capped group keeps exactly the 10 hash-smallest ids (the
    // single-window reference answer, independent of lanes)
    def bucket(i: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-cap|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.take(8), 16) % Sample.Buckets
    }
    val expect = (0L until 500L).sortBy(i => (bucket(i), i)).take(10)
    assert(bySrc("big") == expect.toSet)
    // deterministic under repartitioning and lane-count changes
    val again = Sample.capPerGroup(df.repartition(13), "grp", "id",
      cap = 10, lanes = 9).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(again == bySrc("big") ++ bySrc("small"))
    // input columns preserved, helper columns dropped
    assert(Sample.capPerGroup(df, "grp", "id", 10).columns.toSeq ==
      Seq("id", "grp"))
  }

  test("clusterBalancedSample: per-cell cap, same selection key as capPerGroup") {
    import spark.implicits._
    // two tight 2-d clusters: 30 vectors near (0,0), 5 near (10,10) —
    // with centroids trained, the big cluster must cap, the small one
    // keeps every member
    val vecs = ((0L until 30L).map(i =>
        (i, Seq(0.0 + (i % 5) * 0.01, 0.0 + (i % 7) * 0.01))) ++
      (100L until 105L).map(i =>
        (i, Seq(10.0 + (i % 3) * 0.01, 10.0))))
      .toDF("vec_id", "v")
    val cents = graft.operators.Ann.trainCentroids(
      // seed from one member of each cluster so cells are meaningful
      vecs.filter(col("vec_id").isin(0L, 100L)), "vec_id", "v",
      nlist = 2, iters = 2)
    val kept = Sample.clusterBalancedSample(vecs, "vec_id", "v",
      cents, "cent_id", "cv", cap = 10)
    val byCell = kept.collect()
      .groupBy(_.getAs[Long]("cell")).view.mapValues(_.length).toMap
    assert(byCell.values.toSet == Set(10, 5),
      s"cells should hold 10 (capped) and 5 (under-cap): $byCell")

    // the kept set of the capped cell is exactly capPerGroup over the
    // same assignment — the composition adds selection semantics of
    // its own nowhere
    val assigned = graft.operators.Ann.ivfAssign(vecs, "vec_id", "v",
      cents, "cent_id", "cv")
    val direct = Sample.capPerGroup(assigned, "cell", "vec_id", cap = 10)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      == direct)

    // partitioning-independent
    val repart = Sample.clusterBalancedSample(vecs.repartition(7),
      "vec_id", "v", cents, "cent_id", "cv", cap = 10)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(repart == direct)
  }

  test("capPerGroupIncremental == batch cap; untouched groups ride through") {
    import spark.implicits._
    val all = ((0L until 200L).map(i => (i, "big")) ++
      (1000L until 1003L).map(i => (i, "small")) ++
      (2000L until 2040L).map(i => (i, "quiet"))).toDF("id", "grp")
    val batch = Sample.capPerGroup(all, "grp", "id", cap = 8, lanes = 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // delta touches big and small only; quiet's kept set must ride
    // through untouched (and un-re-ranked)
    val existing = Sample.capPerGroup(
      all.filter(col("id") % 3 =!= 1), "grp", "id", cap = 8, lanes = 4)
    val incr = Sample.capPerGroupIncremental(existing,
      all.filter(col("id") % 3 === 1 && col("grp") =!= "quiet"),
      "grp", "id", cap = 8, lanes = 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // quiet never saw its %3==1 rows — compare against the batch
    // answer over exactly the rows the incremental run has seen
    val seen = Sample.capPerGroup(
      all.filter(col("grp") =!= "quiet" || col("id") % 3 =!= 1),
      "grp", "id", cap = 8, lanes = 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(incr == seen)
    // a delta covering every missing row reproduces the full batch
    val full = Sample.capPerGroupIncremental(existing,
      all.filter(col("id") % 3 === 1), "grp", "id", cap = 8, lanes = 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(full == batch)
    // once dropped, never re-admitted: feeding the incremental output
    // back as existing with an empty-ish delta changes nothing
    val again = Sample.capPerGroupIncremental(
      Sample.capPerGroup(all, "grp", "id", cap = 8, lanes = 4),
      all.limit(0), "grp", "id", cap = 8, lanes = 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == batch)
  }

  test("deterministicShuffle: bijective, partitioning-independent, salt-sensitive") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, s"d$i")).toSeq
      .toDF("id", "payload")
    val out = Sample.deterministicShuffle(df, "id", "s1", bucketsLog2 = 4)
    // pos is a bijection onto [0, n)
    val pos = out.select("pos").collect().map(_.getLong(0)).sorted
    assert(pos.toSeq == (0L until 500L))
    // schema = input + pos; payload rides through
    assert(out.columns.toSeq == Seq("id", "payload", "pos"))
    // identical permutation under any partitioning (pure projection +
    // rank — the df.sample() failure mode this family exists to avoid)
    val perm = out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val reparted = Sample.deterministicShuffle(df.repartition(13),
      "id", "s1", bucketsLog2 = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(perm == reparted)
    // bucket count is an implementation knob, not a semantics knob
    val oneBucket = Sample.deterministicShuffle(df, "id", "s1",
      bucketsLog2 = 0)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(perm == oneBucket)
    // equals the naive single-global-window rank over the same hash
    val h = conv(substring(md5(concat(lit("s1"), lit("|"),
      col("id").cast("string"))), 1, 15), 16, 10).cast("long")
    val naive = df.withColumn("__h", h)
      .withColumn("pos", row_number().over(
        Window.orderBy(col("__h").asc, col("id").asc)) - 1L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(perm == naive)
    // a different salt draws a genuinely different permutation
    val other = Sample.deterministicShuffle(df, "id", "s2",
      bucketsLog2 = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(perm != other)
  }

  test("weightedSample: bias follows weights, deterministic, no replacement") {
    import spark.implicits._
    // 500 heavy (w=10) + 500 light (w=1) rows; ES inclusion -> the
    // heavy half should dominate a k=300 sample decisively
    val df = (0L until 1000L)
      .map(i => (i, if (i < 500) 10.0 else 1.0)).toDF("id", "w")
    val got = Sample.weightedSample(df, "id", col("w"), k = 300)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length === 300)
    assert(got.map(_._1).distinct.length === 300, "replacement!")
    val heavy = got.count(_._2 == 10.0)
    assert(heavy > 220, s"10x weights should dominate: $heavy/300 heavy")

    // deterministic + partitioning-independent
    val again = Sample.weightedSample(df.repartition(13), "id",
      col("w"), k = 300).collect().map(_.getLong(0)).toSet
    assert(again === got.map(_._1).toSet)

    // equal weights == uniform top-k by the same u ordering: compare
    // against the explicit computation
    val uni = Sample.weightedSample(df, "id", lit(1.0), k = 50)
      .collect().map(_.getLong(0)).toSet
    val expectUni = df.select(col("id"),
        (conv(substring(md5(concat(lit("graft-es"), lit("|"),
          col("id").cast("string"))), 1, 13), 16, 10).cast("double") /
          4503599627370496.0).as("u"))
      .orderBy(col("u").desc, col("id")).limit(50)
      .collect().map(_.getLong(0)).toSet
    assert(uni === expectUni)

    // null / non-positive / NaN weights never compete — NaN is the
    // treacherous one: SQL orders NaN above every double, so without
    // its own guard `NaN > 0` passes the filter and ln(u)/NaN ranks
    // FIRST under desc, hijacking the sample
    val mixed = Seq((1L, Some(5.0)), (2L, None), (3L, Some(0.0)),
      (4L, Some(-1.0)), (5L, Some(1.0)), (6L, Some(Double.NaN)))
      .toDF("id", "w")
    val ids = Sample.weightedSample(mixed, "id", col("w"), k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 5L))
  }

  test("mixtureEpochPlan/Expand: caps, repeats, fractional draws, zero cases") {
    import spark.implicits._
    // A: 2 docs x 100 tokens, B: 4 x 50, C: 2 x 50 (not in weights),
    // D: 2 x 50 (weight 0), E in weights but absent from the corpus
    val docRows =
      Seq((0L, "A", 100L), (1L, "A", 100L),
        (10L, "B", 50L), (11L, "B", 50L), (12L, "B", 50L), (13L, "B", 50L),
        (20L, "C", 50L), (21L, "C", 50L),
        (30L, "D", 50L), (31L, "D", 50L))
    val docsDf = docRows.toDF("id", "src", "n_tok")
    val weights = Map("A" -> 0.75, "B" -> 0.25, "D" -> 0.0, "E" -> 0.5)
    // normalized over the MAP: A 0.5, B 1/6, D 0, E 1/3
    val plan = Sample.mixtureEpochPlan(docsDf, "src", "n_tok",
      weights, budget = 1800L, maxEpochs = 4.0)
    val p = plan.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // A: target 900 over 200 tokens -> 4.5 epochs, CAPPED to 4
    assert(p("A") === ((200L, 0.5, 900.0, 4.0)))
    // B: target 300 over 200 -> 1.5 epochs (1 full + half partial);
    // 0.25/1.5 is inexact in binary, so compare with an ulp fence
    assert(math.abs(p("B")._4 - 1.5) < 1e-12)
    // C not in weights -> not planned; E not in corpus -> not planned
    assert(p.keySet === Set("A", "B", "D"))
    assert(p("D")._4 === 0.0)

    val out = Sample.mixtureEpochExpand(docsDf, "id", "src", plan)
      .select("id", "src", "epoch")
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2)))
    // A docs: exactly 4 copies each, epochs 0..3 (frac part is 0)
    assert(rows.filter(_._1 == 0L).map(_._3).sorted.toSeq ===
      Seq(0L, 1L, 2L, 3L))
    assert(rows.filter(_._1 == 1L).map(_._3).sorted.toSeq ===
      Seq(0L, 1L, 2L, 3L))
    // B docs: 1 full epoch + hash-thinned half epoch -> each doc has
    // 1 or 2 copies, and SOME doc of each count exists is too strong
    // for 4 draws; assert the bounds and the epoch numbering
    val bCounts = rows.filter(_._2 == "B").groupBy(_._1)
      .map { case (_, g) => g.length }
    assert(bCounts.forall(n => n == 1 || n == 2))
    assert(rows.filter(_._2 == "B").map(_._3).forall(e => e == 0L || e == 1L))
    // C (unweighted) and D (weight 0) emit nothing
    assert(!rows.exists(r => r._2 == "C" || r._2 == "D"))

    // deterministic and partitioning-independent
    val again = Sample.mixtureEpochExpand(docsDf.repartition(7), "id",
      "src", plan).select("id", "src", "epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(again === rows.sorted.toSeq)

    // zero-token source: plans 0 epochs, no division blow-up
    val zt = Seq((40L, "Z", 0L)).toDF("id", "src", "n_tok")
    val zp = Sample.mixtureEpochPlan(zt, "src", "n_tok",
      Map("Z" -> 1.0), 1000L, 4.0)
    assert(zp.collect().head.getDouble(4) === 0.0)
    assert(Sample.mixtureEpochExpand(zt, "id", "src", zp).count() === 0L)
  }
}
