package graft

import graft.operators.{CommitLogTableFormat => CL}
import org.apache.spark.sql.functions._

/** OPTIMIZE on the commit-log table format: bin-pack compaction,
  * Z-order clustering quality (per-file span collapse on BOTH
  * dimensions), content preservation, time travel across the rewrite,
  * and vacuum reclaiming the pre-optimize layout. */
class OptimizeSpec extends SparkSpec {

  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((a >> i) & 1L) << (2 * i + 1)
      z |= ((b >> i) & 1L) << (2 * i)
    }
    z
  }

  test("zValue: identity-scaled buckets interleave as Morton order") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L),
      (3L, 0L), (0L, 3L))
    val df = rows.toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        CL.zValue(Seq(col("a"), col("b")), Seq(0d, 0d), Seq(3d, 3d),
          bits = 2).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    rows.foreach { case (a, b) =>
      assert(got((a, b)) === mortonRef(a, b, 2),
        s"z($a,$b) mismatch")
    }
  }

  test("zValue: nulls and out-of-range clamp, degenerate span to 0") {
    val df = Seq[(Option[Long], Long)]((Some(5L), 7L), (None, 7L))
      .toDF("a", "b")
    val z = df.select(
      CL.zValue(Seq(col("a"), col("b")), Seq(0d, 7d), Seq(3d, 7d),
        bits = 2).as("z")).collect().map(_.getLong(0)).toSeq
    // a=5 clamps to bucket 3 -> bits at odd positions = 10|1... wait:
    // morton(3,0)=0b1010=10; null a -> bucket 0 -> z 0. b's span is 0
    // so its bucket is always 0.
    assert(z.toSet === Set(mortonRef(3L, 0L, 2), 0L))
  }

  test("compaction: many small files collapse to one, content intact") {
    val path = tmpDir("opt-compact") + "/t"
    val df = spark.range(0, 2000).select(col("id"),
      (col("id") % 97).as("k"), md5(col("id").cast("string")).as("payload"))
    CL.fullRefresh(spark, df.repartition(16), path)
    assert(CL.versions(spark, path) === Seq(1L))
    val st = CL.optimize(spark, path, targetFileBytes = Long.MaxValue)
    assert(st.version === 2L)
    assert(st.filesBefore === 16)
    assert(st.filesAfter === 1)
    assert(st.bytesBefore > 0L)
    val back = CL.read(spark, path).get
    assert(back.select(input_file_name()).distinct().count() === 1L)
    assert(back.count() === 2000L)
    assert(back.agg(sum(col("id"))).head().getLong(0) === 1999L * 2000 / 2)
    // time travel: the pre-optimize snapshot is still readable
    assert(CL.readAt(spark, path, 1L).get.count() === 2000L)
  }

  test("z-order: per-file spans collapse on both dimensions at once") {
    val path = tmpDir("opt-zorder") + "/t"
    // a 64x64 grid in random row order: plain compaction gives every
    // file ~the full range of x AND y; z-order gives tight boxes
    val grid = spark.range(0, 4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).as("y"),
        md5(col("id").cast("string")).as("payload"))
      .orderBy(md5(concat(lit("shuffle"), col("id").cast("string"))))
    CL.fullRefresh(spark, grid.repartition(16), path)

    def spans(): (Double, Double, Long) = {
      val per = CL.read(spark, path).get
        .groupBy(input_file_name().as("f"))
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy"), count(lit(1))).head()
      (per.getDouble(0), per.getDouble(1), per.getLong(2))
    }

    // plain bin-pack to ~8 files first: the unclustered baseline
    val probe = CL.optimize(spark, path, targetFileBytes = Long.MaxValue)
    val target = math.max(1L, probe.bytesBefore / 8)
    CL.optimize(spark, path, targetFileBytes = target)
    val (plainX, plainY, plainN) = spans()
    assert(plainN >= 4, s"expected >=4 files from bin-pack, got $plainN")
    // random order: every file sees nearly the full 63-wide range
    assert(plainX > 50 && plainY > 50,
      s"unclustered baseline should span wide, got ($plainX, $plainY)")

    val st = CL.optimize(spark, path, targetFileBytes = target,
      zorderBy = Seq("x", "y"))
    val (zX, zY, zN) = spans()
    assert(zN >= 4, s"expected >=4 z-ordered files, got $zN")
    // Z-order: with >=4 files over a square grid, each file's box
    // covers at most ~half the range per dimension
    assert(zX < plainX / 1.5 && zY < plainY / 1.5,
      s"z-order should shrink spans: ($zX, $zY) vs ($plainX, $plainY)")
    assert(st.filesAfter.toLong === zN)

    // content is untouched by the rewrite
    val back = CL.read(spark, path).get
    assert(back.count() === 4096L)
    assert(back.select("x", "y").distinct().count() === 4096L)
  }

  test("vacuum reclaims pre-optimize layouts; current stays readable") {
    val path = tmpDir("opt-vacuum") + "/t"
    CL.fullRefresh(spark,
      spark.range(0, 500).toDF("id").repartition(8), path)
    CL.optimize(spark, path, targetFileBytes = Long.MaxValue)
    val dataRoot = new java.io.File(path, "data")
    assert(dataRoot.listFiles().length === 2) // old + new layout
    CL.vacuum(spark, path, keepLast = 1)
    assert(dataRoot.listFiles().length === 1)
    assert(CL.read(spark, path).get.count() === 500L)
    assert(CL.readAt(spark, path, 1L).isEmpty)
  }

  test("rank z-order clusters skewed dimensions equi-width cannot") {
    // bulk x uniform in [0, 4096) plus ONE outlier at 1e15: under
    // equi-width 16-bit scaling every bulk row lands in bucket 0, so
    // width-z-order degenerates to ordering by y alone and each file
    // spans nearly the whole bulk x-range; rank buckets ignore the
    // outlier's magnitude entirely
    val pathW = tmpDir("opt-skew-w") + "/t"
    val pathR = tmpDir("opt-skew-r") + "/t"
    val base = spark.range(0, 4096)
      .select((col("id") % 4096).cast("double").as("x"),
        (col("id") * 2654435761L % 4096).as("y"),
        md5(col("id").cast("string")).as("payload"))
      .union(spark.range(1).select(lit(1e15).as("x"), lit(0L).as("y"),
        lit("outlier").as("payload")))
      .orderBy(md5(concat(lit("s"), col("y").cast("string"),
        col("payload"))))

    def bulkSpanX(path: String): Double = {
      CL.read(spark, path).get.filter(col("x") < 1e14)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("sx"))
        .agg(avg("sx")).head().getDouble(0)
    }
    for ((p, strat) <- Seq((pathW, "width"), (pathR, "rank"))) {
      CL.fullRefresh(spark, base.repartition(16), p)
      val probe = CL.optimize(spark, p, targetFileBytes = Long.MaxValue)
      // default zBits (0 = auto): rank resolves to 8, width to 16 —
      // the natural rank call must not trip the quantile-count guard
      CL.optimize(spark, p, targetFileBytes = probe.bytesBefore / 8,
        zorderBy = Seq("x", "y"), zorderStrategy = strat)
    }
    val (wSpan, rSpan) = (bulkSpanX(pathW), bulkSpanX(pathR))
    assert(wSpan > 3000,
      s"outlier should defeat equi-width x-clustering, span $wSpan")
    assert(rSpan < wSpan / 2,
      s"rank buckets should cluster the bulk: $rSpan vs $wSpan")
    // content untouched by either rewrite
    assert(CL.read(spark, pathR).get.count() === 4097L)
  }

  test("scanPruned: manifest stats skip files, semantics unchanged") {
    val path = tmpDir("opt-prune") + "/t"
    val df = spark.range(0, 4096)
      .select(col("id").as("x"), (col("id") % 7).as("y"),
        md5(col("id").cast("string")).as("payload"))
      .orderBy(md5(concat(lit("s"), col("id").cast("string"))))
    CL.fullRefresh(spark, df.repartition(16), path)
    val probe = CL.optimize(spark, path, targetFileBytes = Long.MaxValue)
    CL.optimize(spark, path, targetFileBytes = probe.bytesBefore / 8,
      zorderBy = Seq("x"))
    val total = CL.read(spark, path).get
      .select(input_file_name()).distinct().count()
    assert(total >= 4)

    val pruned = CL.scanPruned(spark, path, "x", 100d, 300d)
    val filesRead = pruned.select(input_file_name()).distinct().count()
    assert(filesRead < total,
      s"range scan should skip files: read $filesRead of $total")
    // exactly the rows a plain filter returns
    val want = CL.read(spark, path).get
      .filter(col("x") >= 100 && col("x") <= 300)
      .select("x").collect().map(_.getLong(0)).sorted.toSeq
    val got = pruned.select("x").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === want)
  }

  test("scanPruned: files without stats are conservatively kept") {
    val path = tmpDir("opt-nostat") + "/t"
    // fullRefresh records no stats -> nothing prunable, all rows back
    CL.fullRefresh(spark,
      spark.range(0, 100).toDF("x").repartition(4), path)
    val got = CL.scanPruned(spark, path, "x", 10d, 20d)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (10L to 20L).toSeq)
    // a column the manifest never saw prunes nothing either
    CL.optimize(spark, path, targetFileBytes = Long.MaxValue,
      statsColumns = Seq("x"))
    val byStats = CL.scanPruned(spark, path, "x", 10d, 20d)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(byStats === (10L to 20L).toSeq)
  }

  test("scanPruned: NaN-bearing columns record no stats, rows survive") {
    val path = tmpDir("opt-nan") + "/t"
    // NaN poisons Spark's max aggregate (NaN sorts above +Inf): if a
    // NaN range were recorded, NaN >= lo comparisons would prune the
    // file and silently drop its in-range rows
    val df = spark.range(0, 100)
      .select(when(col("id") === 5, lit(Double.NaN))
        .otherwise(col("id").cast("double")).as("x"))
    CL.fullRefresh(spark, df.repartition(2), path)
    CL.optimize(spark, path, targetFileBytes = Long.MaxValue,
      statsColumns = Seq("x"))
    val got = CL.scanPruned(spark, path, "x", 3d, 10d)
      .collect().map(_.getDouble(0)).filterNot(_.isNaN).sorted.toSeq
    assert(got === Seq(3d, 4d, 6d, 7d, 8d, 9d, 10d))
  }

  test("scanPruned: empty intersection returns empty, right schema") {
    val path = tmpDir("opt-empty") + "/t"
    CL.fullRefresh(spark, spark.range(0, 50).toDF("x"), path)
    CL.optimize(spark, path, targetFileBytes = Long.MaxValue,
      statsColumns = Seq("x"))
    val out = CL.scanPruned(spark, path, "x", 1000d, 2000d)
    assert(out.columns.toSeq === Seq("x"))
    assert(out.count() === 0L)
  }

  test("optimize on a missing table raises the typed error") {
    intercept[graft.operators.SnapshotNotFoundException] {
      CL.optimize(spark, tmpDir("opt-none") + "/t")
    }
  }

  test("nulls in a z-order column survive the rewrite") {
    val path = tmpDir("opt-null") + "/t"
    val df = spark.range(0, 100)
      .select(when(col("id") % 10 === 0, lit(null)).otherwise(col("id"))
        .as("x"), col("id").as("y"))
    CL.fullRefresh(spark, df.repartition(4), path)
    CL.optimize(spark, path, targetFileBytes = Long.MaxValue,
      zorderBy = Seq("x", "y"))
    val back = CL.read(spark, path).get
    assert(back.count() === 100L)
    assert(back.filter(col("x").isNull).count() === 10L)
  }
}
