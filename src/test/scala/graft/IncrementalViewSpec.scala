package graft

import graft.streaming.Incremental
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-batch incremental join-view maintenance (the j9 gate pins a
  * single batch against the DuckDB full join). */
class IncrementalViewSpec extends SparkSpec {

  private def canon(df: DataFrame): Set[(Long, Long, String)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("joinViewDelta: chained batches converge to the full re-join, " +
    "batch-split-independent") {
    import spark.implicits._
    def orders(ids: Range) =
      ids.map(i => (i.toLong, (i % 40).toLong)).toDF("okey", "ckey")
    def custs(ids: Range) =
      ids.map(i => (i.toLong, s"cust$i")).toDF("ckey", "cname")

    var viewL = orders(0 until 100)
    var viewR = custs(0 until 20)
    var view = viewL.join(viewR, Seq("ckey"))
      .select("okey", "ckey", "cname")

    val batches = Seq(
      (orders(100 until 160), custs(20 until 30)),
      (orders(160 until 200), custs(30 until 40)))
    for ((dl, dr) <- batches) {
      view = view.unionByName(
        Incremental.joinViewDelta(viewL, dl, viewR, dr, Seq("ckey"))
          .select("okey", "ckey", "cname"))
      viewL = viewL.unionByName(dl)
      viewR = viewR.unionByName(dr)
    }
    val full = orders(0 until 200).join(custs(0 until 40), Seq("ckey"))
      .select("okey", "ckey", "cname")
    // every order key 0..199 matches (ckey = okey%40 < 40): no row
    // may be lost OR duplicated by the delta decomposition
    assert(view.count() == 200L)
    assert(canon(view) == canon(full))
  }

  test("joinViewDelta broadcasts the delta sides by default") {
    import spark.implicits._
    val baseL = (0 until 5000).map(i => (i.toLong, i.toLong % 50))
      .toDF("k", "x")
    val baseR = (0 until 5000).map(i => (i.toLong, s"v$i")).toDF("k", "y")
    val deltaL = Seq((5000L, 1L)).toDF("k", "x")
    val deltaR = Seq((5000L, "v5000")).toDF("k", "y")
    val plan = Incremental.joinViewDelta(baseL, deltaL, baseR, deltaR,
      Seq("k")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast joins in:\n$plan")
  }
}
