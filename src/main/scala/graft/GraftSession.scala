package graft

import org.apache.spark.sql.SparkSession

/** Standard session factory: every entry point (tests, Verify, Bench,
  * pipelines) needs the same conf surface — UTC, ns-parquet tolerance,
  * AQE, non-ANSI casts (SafeCasts relies on null-on-garbage), and
  * local-sized shuffle partitioning.
  */
object GraftSession {
  def builder(cores: Int = 4): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")

  def get(cores: Int = 4): SparkSession = builder(cores).getOrCreate()
}
