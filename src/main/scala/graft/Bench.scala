package graft
import org.apache.spark.sql.SparkSession

/** Headline-query benchmark. One JSON line on stdout:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Methodology: each query runs `SPARK_GRAFT_REPS` times (default 3)
  * and reports the MEDIAN — single-shot timings on a shared box vary
  * ±10%+, which made one r2 "regression" unfalsifiable. The session is
  * warmed (codegen, shuffle infra, parquet reader) before anything is
  * measured; `queries_min` carries the per-query best for
  * noise-floor reading. `SPARK_GRAFT_ONLY` (comma-separated names)
  * restricts the run while iterating.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, shuffle infra, parquet reader +
    // filesystem metadata) so the first measured query doesn't absorb
    // one-time startup cost.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables(spark, sfDir, "region").count()
    // Machine-speed canary: a fixed CPU+shuffle job, data-independent,
    // reported alongside the queries. Round-over-round comparisons on a
    // shared box are only meaningful canary-normalized — the r4
    // "heavy-family drift" turned out to be the box itself: round-3's
    // own end commit, re-benched in round 5, ran t24 1.6x slower than
    // round 3 recorded it.
    val canary = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.range(200000000L)
          .selectExpr("id % 1000 AS k", "id AS v")
          .groupBy("k").sum("v").count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      runs(runs.length / 2)
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        // the composed dedup operators persist small result frames that
        // Spark's CacheManager would share across reps (and across
        // queries with matching sub-plans) — a warm rep must re-run the
        // pipeline, not read the previous rep's cache. release() is the
        // operators' own drain hook; clearCache sweeps anything else.
        CacheRegistry.release()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }.sorted
      if (times.isEmpty) (name, -1.0, -1.0) // failed query, old sentinel
      else (name, times(times.length / 2), times.head)
    }
    // ms precision is below run-to-run noise; the short fixed width
    // also keeps the MAIN line compact — the driver captures only the
    // TAIL of this process's output, and a line longer than its window
    // gets truncated mid-JSON and recorded as unparseable (BENCH_r03).
    // queries_min goes on its OWN earlier line for the same reason.
    def obj(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
    val qs = obj(results.map(r => r._1 -> r._2))
    val qmin = obj(results.map(r => r._1 -> r._3))
    val total = results.map(_._2).sum
    println(s"""{"metric":"queries_min","queries_min":$qmin}""")
    val mainLine =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","reps":$reps,"canary":${f"$canary%.3f"},"queries":$qs,"sf":"$sfDir"}"""
    println(mainLine)
    // The driver captures only the TAIL of stdout, so the queries_min
    // line was lost in r3/r4 ("parsed": null). Persist the full record
    // — medians AND mins in one object — to a file read whole.
    val full =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","reps":$reps,"canary":${f"$canary%.3f"},"queries":$qs,"queries_min":$qmin,"sf":"$sfDir"}"""
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(sys.env.getOrElse(
          "SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")),
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () } // bench output stays best-effort
    spark.stop()
  }
}
