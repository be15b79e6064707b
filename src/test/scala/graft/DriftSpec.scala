package graft

import graft.operators.Drift
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {

  test("psiNumeric: identical distributions → all terms 0; known " +
    "shift reproduces the hand-computed PSI") {
    import spark.implicits._
    val base = (0 until 1000).map(i => i % 100 * 1.0).toDF("v")
    val same = Drift.psiNumeric(base, base, "v", Seq(25.0, 50.0, 75.0))
      .collect()
    assert(same.length == 4)
    assert(same.forall(_.getDouble(3) == 0.0),
      "identical sides must give exactly-zero terms")
    // shift: base uniform over 4 bins (250 each); cur puts 400 in bin
    // 0, 200 in each other → terms from (0.25,0.4) and 3×(0.25,0.2)
    val cur = ((0 until 400).map(_ => 10.0) ++
      (0 until 200).map(_ => 30.0) ++ (0 until 200).map(_ => 60.0) ++
      (0 until 200).map(_ => 80.0)).toDF("v")
    val got = Drift.psiNumeric(base, cur, "v", Seq(25.0, 50.0, 75.0))
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    def term(p: Double, q: Double) = (p - q) * math.log(p / q)
    assert(math.abs(got(0) - term(0.25, 0.4)) < 1e-12)
    (1 to 3).foreach(b =>
      assert(math.abs(got(b) - term(0.25, 0.2)) < 1e-12))
    // total lands in the "moderate shift" band
    val total = got.values.sum
    assert(total > 0.1 && total < 0.25, s"psi=$total")
  }

  test("psiCategorical: appeared/vanished categories spike finitely " +
    "via the eps floor") {
    import spark.implicits._
    val base = (Seq.fill(90)("en") ++ Seq.fill(10)("de")).toDF("lang")
    val cur = (Seq.fill(80)("en") ++ Seq.fill(20)("zh")).toDF("lang")
    val got = Drift.psiCategorical(base, cur, "lang")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set("en", "de", "zh"))
    // de vanished, zh appeared: both sides present in output, both
    // terms large-positive and finite
    val (dn, dc, dterm) = got("de")
    val (zn, zc, zterm) = got("zh")
    assert(dn == 10L && dc == 0L && zn == 0L && zc == 20L)
    assert(dterm.isFinite && zterm.isFinite)
    assert(dterm > 0.5 && zterm > 1.0, s"de=$dterm zh=$zterm")
  }

  test("NULL populations land in ONE matched bin: a stable corpus " +
    "with identical null shares reports zero drift (r7 advice)") {
    import spark.implicits._
    // 20% nulls on BOTH sides, same value distribution otherwise —
    // before the null-safe join this alarmed: the two null bins never
    // matched, each eps-floored into a large psi_term.
    val mk = () => ((0 until 80).map(i => Some(i % 4 * 30.0)) ++
      Seq.fill(20)(Option.empty[Double])).toDF("v")
    val rows = Drift.psiNumeric(mk(), mk(), "v", Seq(25.0, 50.0, 75.0))
      .collect()
    // 4 value bins + exactly ONE null bin
    assert(rows.length == 5, rows.mkString("; "))
    val nullBin = rows.filter(_.isNullAt(0))
    assert(nullBin.length == 1, "null values must form a single bin")
    assert(nullBin.head.getLong(1) == 20L && nullBin.head.getLong(2) == 20L)
    assert(rows.forall(_.getDouble(3) == 0.0),
      "identical sides (incl. null share) must give zero terms: " +
        rows.mkString("; "))
    // and a null-share MOVE is visible: null bin term dominates
    val moved = ((0 until 95).map(i => Some(i % 4 * 30.0)) ++
      Seq.fill(5)(Option.empty[Double])).toDF("v")
    val alarm = Drift.psiNumeric(mk(), moved, "v", Seq(25.0, 50.0, 75.0))
      .collect().filter(_.isNullAt(0))
    assert(alarm.length == 1 && alarm.head.getDouble(3) > 0.1,
      s"null-share move must alarm: ${alarm.mkString}")
    // categorical twin: identical null category on both sides is quiet
    val cat = (Seq.fill(9)(Some("en")) ++ Seq.fill(1)(None)).toDF("lang")
    val catRows = Drift.psiCategorical(cat, cat, "lang").collect()
    assert(catRows.length == 2 &&
      catRows.forall(_.getDouble(3) == 0.0), catRows.mkString("; "))
  }

  test("both corpus sides reduce map-side: the join is bins-sized " +
    "(partial aggregation before the shuffle)") {
    import spark.implicits._
    val df = (0 until 10000).map(_ % 500 * 1.0).toDF("v")
      .repartition(8)
    val plan = Drift.psiNumeric(df, df, "v", Seq(100.0, 300.0))
      .queryExecution.executedPlan.toString
    // partial_count before the exchange = map-side collapse
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"expected partial aggregation in:\n$plan")
  }

  test("madOutliers: hand-computed median/MAD/robust-z counts, " +
    "zero-MAD group yields zero outliers, even-count interpolation") {
    import spark.implicits._
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("a", _)) ++
      Seq(10.0, 10.0, 10.0).map(("b", _)) ++
      Seq(1.0, 2.0).map(("c", _))).toDF("g", "v")
    val got = Drift.madOutliers(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))))
      .toMap
    // a: med 3, ad = [2,1,0,1,97], mad 1, thr 4.4478 → only 97 flags
    assert(got("a") == ((3.0, 1.0, 5L, 1L)))
    // b: mad 0 → threshold 0 and every ad == 0 → nothing flags
    assert(got("b") == ((10.0, 0.0, 3L, 0L)))
    // c: even count → med interpolates to 1.5, mad to 0.5
    assert(got("c") == ((1.5, 0.5, 2L, 0L)))
  }
}
