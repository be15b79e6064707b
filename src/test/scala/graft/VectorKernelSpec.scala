package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._

class VectorKernelSpec extends SparkSpec {

  // the exact HOF forms the kernels replaced — the parity oracle
  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
  private def hofSqDist(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  test("native dot/sqDist are BIT-identical to the interpreted HOF " +
    "fold on deterministic pseudo-random vectors") {
    import spark.implicits._
    val rows = (0 until 200).map { r =>
      val a = Array.tabulate(64)(i =>
        math.sin(r * 64 + i) * 10) // irrational-ish, order-sensitive
      val b = Array.tabulate(64)(i => math.cos(r * 64 + i) * 10)
      (r, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val bad = df.select(
      VectorOps.dot(col("a"), col("b")).as("nd"),
      hofDot(col("a"), col("b")).as("hd"),
      VectorOps.sqDist(col("a"), col("b")).as("ns"),
      hofSqDist(col("a"), col("b")).as("hs"))
      .filter(col("nd") =!= col("hd") || col("ns") =!= col("hs"))
      .count()
    assert(bad == 0L, "kernel must reproduce the sequential fold exactly")
  }

  test("null contract matches zip_with/aggregate: null array, " +
    "mismatched length, null element all yield NULL") {
    import spark.implicits._
    val df = Seq(
      (1, Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),   // 11.0
      (2, None, Some(Seq(1.0))),                        // null array
      (3, Some(Seq(1.0, 2.0)), Some(Seq(1.0))),         // length mism.
      (4, Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0)))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"),
      VectorOps.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got === Map(1 -> Some(11.0), 2 -> None, 3 -> None,
      4 -> Some(5.0)))
    // null ELEMENT -> null (build via sql to get containsNull=true)
    val e = spark.sql(
      "SELECT array(1.0d, cast(null as double)) a, array(1.0d, 2.0d) b")
      .select(VectorOps.dot(col("a"), col("b")).as("d")).head()
    assert(e.isNullAt(0))
  }

  test("float parity on NON-exact binary fractions: kernel == " +
    "asDouble-then-fold, and that is NOT the raw float-precision HOF") {
    import spark.implicits._
    // 0.1f/0.3f/0.7f have no exact binary representation: a float
    // multiply then widen differs from widen-then-double-multiply in
    // the last bits — the kernel's pinned contract is the latter
    val df = Seq((Array(0.1f, 0.3f, 0.7f), Array(0.3f, 0.7f, 0.1f)))
      .toDF("a", "b")
    val viaKernel = df.select(
      VectorOps.dot(col("a"), col("b"))).head().getDouble(0)
    val viaWidened = df.select(VectorOps.dot(
      VectorOps.asDouble(col("a")), VectorOps.asDouble(col("b"))))
      .head().getDouble(0)
    val viaRawFloatHof = df.select(
      hofDot(col("a"), col("b")).cast("double")).head().getDouble(0)
    assert(viaKernel == viaWidened,
      "float inputs must follow the asDouble-then-fold contract exactly")
    assert(viaKernel != viaRawFloatHof,
      "chosen values must actually exercise the float/double divergence")
    // same pin for sqDist
    val sqKernel = df.select(
      VectorOps.sqDist(col("a"), col("b"))).head().getDouble(0)
    val sqWidened = df.select(VectorOps.sqDist(
      VectorOps.asDouble(col("a")), VectorOps.asDouble(col("b"))))
      .head().getDouble(0)
    assert(sqKernel == sqWidened)
  }

  test("float inputs widen per element like asDouble-then-fold; " +
    "the kernel runs inside WholeStageCodegen") {
    import spark.implicits._
    val df = Seq((Array(1.5f, 2.25f), Array(2.0f, 4.0f)))
      .toDF("a", "b")
    val viaFloat = df.select(
      VectorOps.dot(col("a"), col("b")).as("d")).head().getDouble(0)
    val viaCast = df.select(VectorOps.dot(
      VectorOps.asDouble(col("a")), VectorOps.asDouble(col("b")))
      .as("d")).head().getDouble(0)
    assert(viaFloat == viaCast && viaFloat == 12.0)
    // a local Seq collapses to LocalTableScan (evaluated at plan
    // time); check codegen over a real scan instead
    val scan = spark.range(100)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), col("id").cast("double")).as("b"))
    val proj = scan.select(VectorOps.dot(col("a"), col("b")).as("d"))
    // codegen'd operators print with the `*(stageId)` prefix
    val plan = proj.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"),
      s"kernel must not fall back to interpreted:\n$plan")
    assert(proj.agg(sum("d")).head().getDouble(0) ==
      (0 until 100).map(i => 3.0 * i + 2.0 * i).sum)
  }
}
