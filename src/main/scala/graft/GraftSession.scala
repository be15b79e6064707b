package graft

import org.apache.spark.sql.SparkSession

/** Standard session factory: every entry point (tests, Verify, Bench,
  * pipelines) needs the same conf surface — UTC, ns-parquet tolerance,
  * AQE, non-ANSI casts (SafeCasts relies on null-on-garbage), and
  * local-sized shuffle partitioning.
  */
object GraftSession {
  // Catalog tables (bucketing) need a warehouse + embedded metastore;
  // isolate both per-JVM so parallel test JVMs never share Derby locks.
  private lazy val warehouse: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-warehouse").toString
    System.setProperty("derby.system.home", dir)
    dir
  }

  def builder(cores: Int = 4): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.warehouse.dir", warehouse)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")

  def get(cores: Int = 4): SparkSession = builder(cores).getOrCreate()
}
