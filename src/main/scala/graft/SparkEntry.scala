package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps SURVEY.md §2 operator IDs (encoded in the query names) to
  * Spark implementations over the driver testdata; `oracleSql` carries the
  * DuckDB-equivalent SQL for the hash compare. Both views derive from the
  * same QueryDef registry so they can never drift apart.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    _root_.graft.queries.RelationalQueries.defs ++
      _root_.graft.queries.TrainingQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("j1_funnel_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  lazy val oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
