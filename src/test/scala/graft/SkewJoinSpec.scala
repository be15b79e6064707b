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

  test("non-equi or unsupported join types are rejected") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(fact(), dim(), Seq("k"), 1)
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(fact(), dim(), Seq("k"), 8, "right")
    }
  }
}
