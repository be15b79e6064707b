package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantize

class QuantizeSpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    // 3 dims: spread-out, constant, negative-shifted — plus an id
    Seq(
      (0L, Seq(0.0f, 7.0f, -10.0f)),
      (1L, Seq(2.5f, 7.0f, -5.0f)),
      (2L, Seq(10.0f, 7.0f, 0.0f)),
      (3L, Seq(5.0f, 7.0f, -2.5f)))
      .toDF("id", "v")
  }

  test("dimBounds: per-dim min/max; constant dim spans zero") {
    val (mn, mx) = Quantize.dimBounds(vecs, "v", 3)
    assert(mn === Seq(0.0, 7.0, -10.0))
    assert(mx === Seq(10.0, 7.0, 0.0))
  }

  test("encode: endpoints hit 0/255, constant dim -> 0, codes bounded") {
    val (mn, mx) = Quantize.dimBounds(vecs, "v", 3)
    val codes = vecs.select(col("id"),
        Quantize.encode(col("v"), mn, mx).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes(0L) === Seq(0L, 0L, 0L))    // min endpoints + const
    assert(codes(2L) === Seq(255L, 0L, 255L)) // max endpoints
    // interior: floor((2.5-0)*255/10 + .5) = floor(64.25) = 64
    assert(codes(1L)(0) === 64L)
    // reconstruction error of any code <= half a bucket
    for ((_, c) <- codes; (q, d) <- c.zipWithIndex if mx(d) > mn(d)) {
      assert(q >= 0L && q <= 255L)
    }
  }

  test("quantized top-k agrees with exact cosine top-k on separated clusters") {
    import spark.implicits._
    // two tight clusters far apart: quantization noise cannot flip
    // cluster membership, so quantized-dot ranking finds the same
    // nearest cluster as exact cosine
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 100.0f else -100.0f
      (i.toLong, Seq(base + i, base - i, base + 2 * i).map(_.toFloat))
    }
    val df = rows.toDF("id", "v")
    val (mn, mx) = Quantize.dimBounds(df, "v", 3)
    val coded = df.select(col("id"), Quantize.encode(col("v"), mn, mx).as("c"))
    val probe = coded.filter(col("id") === 0)
      .select(col("c").as("pc"))
    val top = coded.crossJoin(broadcast(probe))
      .filter(col("id") =!= 0)
      .select(col("id"), Quantize.quantizedDot(col("c"), col("pc")).as("dot"))
      .orderBy(col("dot").desc, col("id").asc).limit(10)
      .collect().map(_.getLong(0))
    assert(top.forall(_ % 2 == 0), s"quantized top-10 crossed clusters: ${top.mkString(",")}")
  }

  test("clipStats: frozen bounds flag out-of-range appends; in-range clean") {
    import spark.implicits._
    val (mn, mx) = Quantize.dimBounds(vecs, "v", 3)
    // dim 0 range [0,10], dim 1 const 7, dim 2 range [-10,0]
    val append = Seq(
      (10L, Seq(5.0f, 7.0f, -5.0f)),   // fully in range
      (11L, Seq(-1.0f, 8.0f, 1.0f)),   // low, high, high
      (12L, Seq(20.0f, 6.0f, -20.0f))) // high, low, low
      .toDF("id", "v")
    val got = Quantize.clipStats(append, "v", mn, mx)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(0L) === ((3L, 1L, 1L, round6(2.0 / 3))))
    assert(got(1L) === ((3L, 1L, 1L, round6(2.0 / 3))))
    assert(got(2L) === ((3L, 1L, 1L, round6(2.0 / 3))))
    // clean append: all zero
    val clean = Quantize.clipStats(vecs, "v", mn, mx)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(clean === Set((0L, 0L)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("encode is partitioning-independent and deterministic") {
    val (mn, mx) = Quantize.dimBounds(vecs, "v", 3)
    val a = vecs.select(Quantize.encode(col("v"), mn, mx).as("c"))
      .collect().map(_.getSeq[Long](0)).toSet
    val b = vecs.repartition(7)
      .select(Quantize.encode(col("v"), mn, mx).as("c"))
      .collect().map(_.getSeq[Long](0)).toSet
    assert(a === b)
  }
}
