package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verified query: a Spark implementation plus (when SQL-expressible) a
  * DuckDB oracle over the same parquet tables. Column names MUST match
  * between the two — the driver sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Table loader for the driver-provided testdata directory.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS) which Spark has no native type
  * for; sessions set spark.sql.legacy.parquet.nanosAsLong=true and the
  * loader converts ns→µs here (integer DIV — a double division would lose
  * precision above 2^53) so every query sees a real TimestampType column
  * with the same truncation DuckDB applies at µs precision.
  */
object Tables {

  /** Scratch path for a gate that materializes a table, scoped by the
    * input dir: concurrent sf0.01 verify + sf1 bench runs share one
    * box and must never clobber each other's tables mid-query. The
    * ONE definition of the scoping scheme — j10's catalog-name tag
    * and every /tmp gate path derive from it, INCLUDING the two
    * gates whose DuckDB oracle reads the path off disk (t65/t68):
    * their oracle strings interpolate [[oracleGatePath]], which
    * resolves against the dir Verify was launched with. */
  def gateTag(dir: String): String =
    java.lang.Integer.toHexString(dir.hashCode)

  def gatePath(dir: String, name: String): String =
    s"/tmp/graft_gate_${name}_${gateTag(dir)}"

  /** Placeholder an export-reading oracle embeds where the dir hash
    * goes; Verify substitutes the REAL gateTag(sfDir) at dump time.
    * Late binding by token, not by process-global state: the oracle
    * string is correct no matter when (or how many times, for which
    * dirs) the registry initializes. */
  val GateDirToken = "__GATEDIR__"

  /** The token form of [[gatePath]] for oracle SQL — resolves to the
    * same scoped path the Spark side writes once Verify substitutes
    * the launch dir's tag. */
  def oracleGatePath(name: String): String =
    s"/tmp/graft_gate_${name}_$GateDirToken"

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
        acc.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      // driver data has also shipped ts as TIMESTAMP(MICROS) without a
      // zone (Spark: TIMESTAMP_NTZ, which unix_micros & co. reject) —
      // normalize to TimestampType; exact because sessions pin UTC
      else if (f.name == "ts" &&
          f.dataType == org.apache.spark.sql.types.TimestampNTZType)
        acc.withColumn("ts", acc("ts").cast(
          org.apache.spark.sql.types.TimestampType))
      else acc
    }
  }
}
