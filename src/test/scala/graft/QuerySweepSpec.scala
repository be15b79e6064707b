package graft

/** Executes EVERY registered gate query against the driver's smallest
  * testdata. This is the net under Verify: its per-query catch prints
  * to stderr and writes no parquet, so a query that stops analyzing
  * (e.g. the r6 TIMESTAMP_NTZ drift that silently dropped
  * d2/j7/j8 from the driver's correctness run) vanishes from the gate
  * list without failing anything. Here it fails `sbt test` instead.
  */
class QuerySweepSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  if (new java.io.File(sfDir).isDirectory) {
    SparkEntry.allDefs.foreach { d =>
      test(s"query ${d.name} executes on sf0.001") {
        // count() forces full analysis + execution; empty results are
        // legal for some gates, throwing is the only failure mode here
        d.fn(spark, sfDir).count()
      }
    }
  } else {
    test("driver testdata present") {
      cancel(s"$sfDir missing — sweep skipped")
    }
  }
}
