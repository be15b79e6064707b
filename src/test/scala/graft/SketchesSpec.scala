package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Sketch accuracy contracts measured against exact answers. */
class SketchesSpec extends SparkSpec {

  test("distinctProfile: HLL++ estimate within 3x rsd of exact") {
    import spark.implicits._
    // group a: 10_000 distinct; group b: 500 distinct (with repeats)
    val df = ((0 until 50000).map(i => ("a", (i % 10000).toLong)) ++
      (0 until 20000).map(i => ("b", (i % 500).toLong)))
      .toDF("g", "k")
    val prof = Sketches.distinctProfile(df, Seq("g"), "k", rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(math.abs(prof("a") - 10000.0) / 10000.0 <= 0.15,
      s"group a estimate ${prof("a")}")
    assert(math.abs(prof("b") - 500.0) / 500.0 <= 0.15,
      s"group b estimate ${prof("b")}")
  }

  test("quantileProfile: GK quantiles within rank-error bound") {
    import spark.implicits._
    val n = 100000
    val df = (0 until n).map(i => ("g", i.toLong)).toDF("g", "v")
    val q = Sketches.quantileProfile(df, Seq("g"), "v",
      Seq(0.5, 0.9, 0.99), accuracy = 1000)
      .collect()(0)
    // accuracy=1000 → rank error ≤ n/1000 = 100 positions
    val (q50, q90, q99) = (q.getLong(1), q.getLong(2), q.getLong(3))
    assert(math.abs(q50 - n / 2) <= n / 1000 + 1, s"q50=$q50")
    assert(math.abs(q90 - 9 * n / 10) <= n / 1000 + 1, s"q90=$q90")
    assert(math.abs(q99 - 99 * n / 100) <= n / 1000 + 1, s"q99=$q99")
  }

  test("bloomPrune: no false negatives, fp rate bounded, no UDF in plan") {
    import spark.implicits._
    val keys = (0L until 2000L).map(k => Tuple1(k * 3)).toDF("k")
    // a Range source keeps the Filter in the plan — over a
    // LocalRelation Catalyst folds the whole predicate away before
    // the plan assert can see it
    val large = spark.range(60000L).toDF("k")
    val pruned = Sketches.bloomPrune(large, keys, "k",
      expectedItems = 2000, fpp = 0.01)
    val survived = pruned.collect().map(_.getLong(0)).toSet
    // every true key survives (false positives only, never negatives)
    val trueKeys = (0L until 2000L).map(_ * 3).toSet
    assert(trueKeys.subsetOf(survived))
    // false-positive rate within ~3x nominal
    val fps = survived.size - trueKeys.size
    val fpRate = fps.toDouble / (60000 - trueKeys.size)
    assert(fpRate <= 0.03, s"fp rate $fpRate")
    // the probe is the codegen'd native predicate, not a UDF
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(500))
    assert(!plan.contains("UDF"), "probe fell back to a UDF")
  }

  test("bloomPrune: string keys hash consistently on both sides") {
    import spark.implicits._
    // BloomFilterMightContain only accepts longs, so string keys ride
    // through xxhash64 on BOTH the build and probe sides
    val keys = (0 until 500).map(i => Tuple1(s"key-${i * 7}")).toDF("k")
    val large = spark.range(20000L)
      .select(concat(lit("key-"), col("id")).as("k"))
    val pruned = Sketches.bloomPrune(large, keys, "k",
      expectedItems = 500, fpp = 0.01)
    val survived = pruned.collect().map(_.getString(0)).toSet
    val trueKeys = (0 until 500).map(i => s"key-${i * 7}").toSet
    assert(trueKeys.subsetOf(survived), "string key dropped: false negative")
    val fpRate = (survived.size - trueKeys.size).toDouble /
      (20000 - trueKeys.size)
    assert(fpRate <= 0.03, s"fp rate $fpRate")
    // mixed-type keys still rejected loudly
    intercept[IllegalArgumentException] {
      Sketches.bloomPrune(spark.range(10).toDF("k"), keys, "k", 10)
    }
  }

  test("countMin: estimates never undercount; exact when width is ample") {
    import spark.implicits._
    // zipf-ish: key k appears 200/k times, keys 1..40 -> 40 distinct
    val rows = (1 to 40).flatMap(k => Seq.fill(200 / k)(k.toLong))
    val df = spark.createDataset(rows).toDF("k").repartition(7)
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val keys = exact.keys.toSeq.toDF("k")

    // tight sketch: collisions certain (width 16 << 40 keys)
    val tight = Sketches.countMin(df, "k", depth = 4, width = 16)
    val estT = Sketches.countMinEstimate(tight, keys, "k", 4, 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      assert(estT(k) >= c, s"CM underestimated key $k: ${estT(k)} < $c")
    }
    assert(exact.exists { case (k, c) => estT(k) > c },
      "width 16 over 40 keys should collide somewhere")

    // ample sketch: every estimate exact
    val wide = Sketches.countMin(df, "k", depth = 4, width = 4096)
    val estW = Sketches.countMinEstimate(wide, keys, "k", 4, 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      assert(estW(k) === c, s"ample CM should be exact for key $k")
    }

    // error contract: est - exact <= e/width * n for most keys
    val n = rows.size
    val eps = math.E / 16 * n
    val within = exact.count { case (k, c) => estT(k) - c <= eps }
    assert(within >= exact.size * 0.9,
      s"CM error bound held for only $within/${exact.size} keys")
  }

  test("countMinEstimate plan: the sketch probe is a broadcast join") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i % 40).toLong).toDF("k")
    val sk = Sketches.countMin(df, "k", depth = 3, width = 64)
    val est = Sketches.countMinEstimate(sk, df.distinct(), "k", 3, 64)
    est.collect()
    val plan = est.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "sketch probe should broadcast the bounded cell matrix")
  }

  test("countMin: null keys keep the upper-bound contract") {
    import spark.implicits._
    val df = (Seq.fill(100)(Option.empty[Long]) ++
      (1 to 50).map(i => Some(i.toLong))).toDF("k")
    val sk = Sketches.countMin(df, "k", depth = 3, width = 64)
    val keys = Seq(Option.empty[Long], Some(7L)).toDF("k")
    val est = Sketches.countMinEstimate(sk, keys, "k", 3, 64)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
        r.getLong(1)).toMap
    assert(est(-1L) >= 100L, s"null-key estimate ${est(-1L)} undercounts")
    assert(est(7L) >= 1L)
  }

  test("countMin: sketches over disjoint data merge by cell sum") {
    import spark.implicits._
    val a = (1 to 300).map(i => (i % 23).toLong).toDF("k")
    val b = (1 to 500).map(i => (i % 31).toLong).toDF("k")
    val whole = Sketches.countMin(a.union(b), "k", depth = 3, width = 64)
    val merged = Sketches.countMin(a, "k", depth = 3, width = 64)
      .union(Sketches.countMin(b, "k", depth = 3, width = 64))
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
    val w = whole.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val m = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(w === m, "merged per-part sketches must equal the whole-data sketch")
  }

  test("distinctSketch asset: daily merge == whole-corpus sketch, estimate accurate") {
    import spark.implicits._
    // day 1: sources a (4000 distinct) + b (300); day 2: a again with
    // half-overlapping keys, plus a NEW source c
    val day1 = ((0 until 8000).map(i => ("a", (i % 4000).toLong)) ++
      (0 until 900).map(i => ("b", (i % 300).toLong)))
      .toDF("src", "k")
    val day2 = ((0 until 6000).map(i => ("a", (2000 + i % 4000).toLong)) ++
      (0 until 400).map(i => ("c", (i % 200).toLong)))
      .toDF("src", "k")
    val merged = Sketches.distinctSketchMerge(
      Sketches.distinctSketch(day1, Seq("src"), "k")
        .unionByName(Sketches.distinctSketch(day2, Seq("src"), "k")),
      Seq("src"))
    val est = Sketches.distinctSketchEstimate(merged, Seq("src"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // HLL registers are per-bucket maxima: merged state answers
    // EXACTLY what the whole-corpus sketch answers
    val whole = Sketches.distinctSketchEstimate(
      Sketches.distinctSketch(day1.unionByName(day2), Seq("src"), "k"),
      Seq("src"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(est === whole, "merge must be lossless vs whole-corpus sketch")
    // accuracy: a = 6000 true distinct (0..5999), b = 300, c = 200;
    // lgK 12 -> rse ~1.6%, allow 3x
    val truth = Map("a" -> 6000.0, "b" -> 300.0, "c" -> 200.0)
    truth.foreach { case (s, t) =>
      assert(math.abs(est(s)._2 - t) / t < 0.05,
        s"source $s estimate ${est(s)._2} vs true $t")
    }
    // n_rows sums exactly; c survives the merge with day-2-only state
    assert(est("a")._1 == 14000L && est("b")._1 == 900L &&
      est("c")._1 == 400L)
  }

  test("kmvSketch: merge is bit-for-bit the whole-corpus sketch; " +
    "below-capacity groups estimate exactly") {
    import spark.implicits._
    val k = 64
    val day1 = ((0 until 5000).map(i => ("a", (i % 3000).toLong)) ++
      (0 until 100).map(i => ("b", (i % 40).toLong))).toDF("src", "v")
    val day2 = ((0 until 5000).map(i => ("a", (1500 + i % 3000).toLong)) ++
      (0 until 60).map(i => ("c", (i % 25).toLong))).toDF("src", "v")
    val merged = Sketches.kmvMerge(
      Sketches.kmvSketch(day1, Seq("src"), "v", k)
        .unionByName(Sketches.kmvSketch(day2, Seq("src"), "v", k)),
      Seq("src"), k)
    val whole = Sketches.kmvSketch(day1.unionByName(day2),
      Seq("src"), "v", k)
    // every dropped hash was above a surviving k-th minimum: the
    // merged retained set IS the whole-corpus retained set
    val m = merged.collect()
      .map(r => r.getString(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    val w = whole.collect()
      .map(r => r.getString(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    assert(m === w, "kmvMerge must equal the whole-corpus sketch")
    val est = Sketches.kmvEstimate(merged, Seq("src"), k)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // b (40 distinct) and c (25) are below k → EXACT
    assert(est("b") == 40.0 && est("c") == 25.0)
    // a: 4500 true distinct; k=64 → rse ~1/sqrt(62) ≈ 12.7%, allow 3x
    assert(math.abs(est("a") - 4500.0) / 4500.0 <= 0.38,
      s"kmv estimate ${est("a")} vs 4500")
  }

  test("kmvSetEstimates: intersection within tolerance, exact when " +
    "both sketches below capacity") {
    import spark.implicits._
    val k = 128
    // A = 0..3999, B = 2000..5999 → |A|=|B|=4000, |A∪B|=6000, |A∩B|=2000
    val a = (0 until 4000).map(v => ("g", v.toLong)).toDF("grp", "v")
    val b = (2000 until 6000).map(v => ("g", v.toLong)).toDF("grp", "v")
    val est = Sketches.kmvSetEstimates(
      Sketches.kmvSketch(a, Seq("grp"), "v", k),
      Sketches.kmvSketch(b, Seq("grp"), "v", k),
      Seq("grp"), k).collect()(0)
    val (ea, eu, ei) = (est.getDouble(1), est.getDouble(3), est.getDouble(4))
    assert(math.abs(ea - 4000) / 4000.0 <= 0.3, s"est_a=$ea")
    assert(math.abs(eu - 6000) / 6000.0 <= 0.3, s"est_union=$eu")
    assert(math.abs(ei - 2000) / 2000.0 <= 0.5, s"est_inter=$ei")
    // tiny sets: every hash retained → estimates are EXACT counts
    val sa = (0 until 50).map(v => ("g", v.toLong)).toDF("grp", "v")
    val sb = (30 until 80).map(v => ("g", v.toLong)).toDF("grp", "v")
    val ex = Sketches.kmvSetEstimates(
      Sketches.kmvSketch(sa, Seq("grp"), "v", k),
      Sketches.kmvSketch(sb, Seq("grp"), "v", k),
      Seq("grp"), k).collect()(0)
    assert(ex.getDouble(1) == 50.0 && ex.getDouble(2) == 50.0 &&
      ex.getDouble(3) == 80.0 && ex.getDouble(4) == 20.0,
      s"below-capacity set algebra must be exact: $ex")
  }

  test("kmvSketch: NULLs are excluded like COUNT(DISTINCT); n_rows " +
    "counts non-null rows only") {
    import spark.implicits._
    val df = ((0 until 100).map(v => Tuple1(java.lang.Long.valueOf(v.toLong))) ++
      Seq(Tuple1(null.asInstanceOf[java.lang.Long]),
        Tuple1(null.asInstanceOf[java.lang.Long])))
      .toDF("v").withColumn("grp", lit("g"))
    val est = Sketches.kmvEstimate(
      Sketches.kmvSketch(df, Seq("grp"), "v", 256), Seq("grp"), 256)
      .collect()(0)
    // below capacity → exact: 100 distinct, not 101 (no NULL hash)
    assert(est.getDouble(2) == 100.0, s"NULL leaked into the sketch: $est")
    assert(est.getLong(1) == 100L, s"n_rows counted NULL rows: $est")
    // a group whose values are ALL NULL still emits its row — empty
    // sketch, n_rows 0, exact estimate 0 — like GROUP BY keeps the
    // group rather than silently dropping a present-but-valueless one
    val mixed = Seq(("g", java.lang.Long.valueOf(7L)),
      ("h", null.asInstanceOf[java.lang.Long]),
      ("h", null.asInstanceOf[java.lang.Long])).toDF("grp", "v")
    val both = Sketches.kmvEstimate(
      Sketches.kmvSketch(mixed, Seq("grp"), "v", 256), Seq("grp"), 256)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(both("g") == ((1L, 1.0)))
    assert(both("h") == ((0L, 0.0)), s"all-NULL group dropped: $both")
  }

  test("misraGries: recall guarantee holds under any partitioning; " +
    "candidate count bounded by k per partition") {
    import spark.implicits._
    // 3 heavy values (500 each) among 1500 singletons: n = 3000,
    // k = 16 → heavy iff freq*17 > 3000, i.e. freq > 176
    val rows = (0 until 1500).flatMap(i =>
      Seq(s"heavy${i % 3}", s"tail$i")).map(Tuple1(_))
    val k = 16
    for (parts <- Seq(1, 4, 13)) {
      val df = rows.toDF("v").repartition(parts)
      val cand = Sketches.misraGries(df, "v", k).collect()
      assert(cand.length <= k * parts, s"parts=$parts: ${cand.length}")
      val vals = cand.map(_.getString(0)).toSet
      assert((0 until 3).forall(h => vals(s"heavy$h")),
        s"parts=$parts lost a heavy hitter: $vals")
    }
  }

  test("heavyHitters: exact counts, equals the naive groupBy-filter; " +
    "empty when nothing crosses the threshold") {
    import spark.implicits._
    val rows = ((0 until 1500).flatMap(i =>
      Seq(s"heavy${i % 3}", s"tail$i")) ++ Seq("heavy0")).map(Tuple1(_))
    val df = rows.toDF("v").repartition(7)
    val got = Sketches.heavyHitters(df, "v", k = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("heavy0" -> 501L, "heavy1" -> 500L,
      "heavy2" -> 500L))
    // uniform data: no value's freq*(k+1) exceeds n → empty result
    val flat = (0 until 300).map(i => Tuple1(s"u$i")).toDF("v")
    assert(Sketches.heavyHitters(flat, "v", k = 16).count() == 0L)
  }

  test("histogram asset: split-then-merge is BIT-identical to a " +
    "one-pass build, whatever the split") {
    import spark.implicits._
    val edges = Seq(10.0, 20.0, 40.0)
    val df = (0 until 1000)
      .map(i => ("g" + i % 2, i % 50 * 1.0)).toDF("g", "v")
    val onePass = Sketches.histogramSketch(df, Seq("g"), "v", edges)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .toSet
    val split = df.withColumn("part", pmod(crc32(col("v").cast("string")),
      lit(7)))
    val merged = Sketches.histogramMerge(
      Sketches.histogramSketch(split, Seq("g", "part"), "v", edges)
        .drop("part"), Seq("g"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .toSet
    assert(merged === onePass)
  }

  test("histogramQuantile: hand-computed interpolation, outer-bin " +
    "clamps, NULL bin excluded from N") {
    import spark.implicits._
    val edges = Seq(10.0, 20.0, 40.0)
    // g: 4 below 10 | 8 in [10,20) | 6 in [20,40) | 2 >= 40, 2 NULLs
    val vals: Seq[Option[Double]] =
      (0 until 4).map(i => Some(i * 2.0)) ++
        (0 until 8).map(i => Some(10.0 + i)) ++
        (0 until 6).map(i => Some(20.0 + i * 3)) ++
        Seq(Some(45.0), Some(50.0), None, None)
    val df = vals.map(v => ("g", v)).toDF("g", "v")
    val sk = Sketches.histogramSketch(df, Seq("g"), "v", edges)
    // null bin present in the ASSET (drift visibility)...
    assert(sk.filter(col("bin").isNull).head().getLong(2) == 2L)
    val q = Sketches.histogramQuantile(sk, Seq("g"), edges,
      Seq(0.1, 0.5, 0.8, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // ...but N = 20 observed values, not 22
    // p=0.1 → t=2 → bin 0 (cum 4) → clamps to first edge
    assert(q(0.1) == 10.0)
    // p=0.5 → t=10 → bin 1 (cum 4..12): 10 + (10-4)/8 * 10 = 17.5
    assert(q(0.5) == 17.5)
    // p=0.8 → t=16 → bin 2 (cum 12..18): 20 + (16-12)/6 * 20
    assert(q(0.8) == 20.0 + 4.0 / 6.0 * 20.0)
    // p=1.0 → t=20 → bin 3 (open top) → clamps to last edge
    assert(q(1.0) == 40.0)
  }
}
