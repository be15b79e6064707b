package graft

import graft.operators.Scd
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {

  private def dim() = {
    import spark.implicits._
    // key 1: a@1, a@2 (collapse), b@3, a@5 (reopen) — 3 episodes
    // key 2: single observation — one open episode
    // key 3: null-transition checks: null@1, null@2 (collapse), x@3
    Seq(
      (1L, 1L, Some("a")), (1L, 2L, Some("a")), (1L, 3L, Some("b")),
      (1L, 5L, Some("a")),
      (2L, 7L, Some("z")),
      (3L, 1L, Option.empty[String]), (3L, 2L, Option.empty[String]),
      (3L, 3L, Some("x"))
    ).toDF("k", "ver", "v")
  }

  test("scd2: consecutive same values collapse, value reopens as a " +
    "new episode, intervals chain half-open, last is current") {
    val got = Scd.scd2(dim(), Seq("k"), "ver", Seq("v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(got === Set(
      (1L, "a", 1L, 3L, false),
      (1L, "b", 3L, 5L, false),
      (1L, "a", 5L, -1L, true),
      (2L, "z", 7L, -1L, true),
      (3L, null, 1L, 3L, false),
      (3L, "x", 3L, -1L, true)))
  }

  test("reserved output/temp column names in the input are rejected " +
    "instead of silently clobbered") {
    import spark.implicits._
    val withReserved = Seq((1L, 1L, "a", "x"))
      .toDF("k", "ver", "v", "valid_from")
    val e = intercept[IllegalArgumentException] {
      Scd.scd2(withReserved, Seq("k"), "ver", Seq("v"))
    }
    assert(e.getMessage.contains("valid_from"))
    val withTemp = Seq((1L, 1L, "a", true)).toDF("k", "ver", "v", "__chg")
    intercept[IllegalArgumentException] {
      Scd.scd2(withTemp, Seq("k"), "ver", Seq("v"))
    }
  }

  test("asOf: point-in-time lookup honors the half-open convention") {
    val d = Scd.scd2(dim(), Seq("k"), "ver", Seq("v"))
    def at(v: Long) = Scd.asOf(d, lit(v))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at(2L) === Map(1L -> "a", 3L -> null))
    assert(at(3L) === Map(1L -> "b", 3L -> "x")) // boundary: new value
    assert(at(6L) === Map(1L -> "a", 3L -> "x"))
    assert(at(7L) === Map(1L -> "a", 2L -> "z", 3L -> "x"))
    assert(at(0L) === Map.empty[Long, String]) // before any history
  }

  test("one key-shuffle total: both windows share the partitioning " +
    "(exactly one Exchange in the plan)") {
    val plan = Scd.scd2(dim(), Seq("k"), "ver", Seq("v"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 exchange:\n$plan")
  }
}
