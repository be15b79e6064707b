package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  private def fact() = {
    import spark.implicits._
    // 90% of rows on key 0, remainder spread over 1..9
    (0 until 2000).map(i =>
      (if (i % 10 == 0) (i / 10) % 9 + 1 else 0L, i.toLong))
      .toDF("k", "x")
  }

  private def dim() = {
    import spark.implicits._
    (0L to 9L).map(k => (k, s"d$k")).toDF("k", "name")
  }

  test("salted inner join is bit-identical to the unsalted join") {
    val plain = fact().join(dim(), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    val salted = SkewJoin.saltedJoin(fact(), dim(), Seq("k"), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    assert(salted == plain)
  }

  test("left join keeps unmatched big-side rows exactly once") {
    import spark.implicits._
    val d = dim().filter(col("k") =!= 0) // hot key has NO dim row
    val got = SkewJoin.saltedJoin(fact(), d, Seq("k"), 4, "left")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).sorted.toSeq
    val want = fact().join(d, Seq("k"), "left")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).sorted.toSeq
    assert(got == want)
    assert(got.count(_._3.isEmpty) == 1800) // every hot row survives
  }

  test("the hot key's rows spread across many shuffle partitions " +
    "and the salt is deterministic across runs") {
    // spread: group the salted big side by its internal salt — the
    // hot key must occupy >1 salt bucket (that IS the mechanism that
    // splits the reducer). Re-derive the salt exactly as the
    // operator does (whole-row xxhash64).
    val f = fact()
    val salted = f.withColumn("s",
      pmod(xxhash64(f.columns.map(col): _*), lit(8L)).cast("int"))
    val hotSpread = salted.filter(col("k") === 0)
      .select(countDistinct(col("s"))).head().getLong(0)
    assert(hotSpread == 8L,
      s"hot key should spread over all 8 salts, got $hotSpread")
    // determinism: two independent evaluations agree row for row
    val a = salted.collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val b = salted.collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(a == b)
  }

  test("saltBy: byte-identical duplicate hot rows get zero spread " +
    "under the whole-row default but full spread via saltBy — with " +
    "parity either way") {
    import spark.implicits._
    // the default-value-key pathology: the hot key's rows all repeat
    val dup = ((0 until 1600).map(i => (0L, "same", i.toLong)) ++
      (0 until 40).map(i => ((i % 9) + 1L, s"v$i", 10000L + i)))
      .toDF("k", "payload", "row_id")
    val dupNoId = dup.drop("row_id")
      .withColumn("row_id", lit(0L)) // make every hot row identical
    val defSpread = dupNoId.filter(col("k") === 0)
      .select(countDistinct(pmod(
        xxhash64(dupNoId.columns.map(col): _*), lit(8L))))
      .head().getLong(0)
    assert(defSpread == 1L, "identical rows must expose the cap")
    // saltBy a distinguishing column restores the spread
    val byIdSpread = dup.filter(col("k") === 0)
      .select(countDistinct(pmod(xxhash64(col("row_id")), lit(8L))))
      .head().getLong(0)
    assert(byIdSpread == 8L)
    val plain = dup.join(dim(), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).sorted.toSeq
    val salted = SkewJoin.saltedJoin(dup, dim(), Seq("k"), 8,
      saltBy = Seq("row_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).sorted.toSeq
    assert(salted == plain, "saltBy path must keep bit-parity")
  }

  test("map-typed big-side columns are excluded from the default " +
    "salt source (xxhash64 cannot hash maps); all-map requires saltBy") {
    import spark.implicits._
    val big = Seq((1L, "a")).toDF("k", "v")
      .withColumn("m", map(lit("x"), lit(1)))
    val small = Seq((1L, "dim")).toDF("k", "d")
    // would fail analysis with 'hash on map type' without the filter
    assert(SkewJoin.saltedJoin(big, small, Seq("k"), salts = 4)
      .count() == 1L)
    // a big side with ONLY unhashable non-key columns still works via
    // explicit saltBy on the key
    val onlyMap = Seq(1L).toDF("k").withColumn("m", map(lit("x"), lit(1)))
    assert(SkewJoin.saltedJoin(onlyMap, small, Seq("k"), salts = 4,
      saltBy = Seq("k")).count() == 1L)
  }

  test("a pre-existing internal salt column on either side is " +
    "rejected instead of silently clobbered") {
    import spark.implicits._
    val big = Seq((1L, 0)).toDF("k", "__graft_salt")
    val small = Seq((1L, "dim")).toDF("k", "d")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, Seq("k"), salts = 4)
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(small, big, Seq("k"), salts = 4)
    }
  }

  test("non-equi or unsupported join types are rejected") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(fact(), dim(), Seq("k"), 1)
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(fact(), dim(), Seq("k"), 8, "right")
    }
  }
}
