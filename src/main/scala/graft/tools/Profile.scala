package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler: times labeled actions so hot spots inside a
  * query pipeline can be isolated. Usage:
  *   sbt "runMain graft.tools.Profile <sfDir>"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    import org.apache.spark.sql.functions._
    import graft.functions.TextOps

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32)
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
    time("tokens")(toks.selectExpr("sum(size(tk))").collect())
    val sh = docs.withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"), TextOps.shingles3(col("tk")).as("sh"))
    time("shingles3 (bound tk)")(sh.selectExpr("sum(size(sh))").collect())
    val shNoDistinct = docs.withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"), when(size(col("tk")) >= 3,
        transform(sequence(lit(0), size(col("tk")) - 3),
          i => concat_ws(" ", get(col("tk"), i), get(col("tk"), i + 1),
            get(col("tk"), i + 2)))).otherwise(array().cast("array<string>"))
        .as("sh"))
    time("shingles3 no distinct")(shNoDistinct.selectExpr("sum(size(sh))").collect())
    val hs = sh.withColumn("hs", transform(col("sh"), x => TextOps.tokenHash32(x)))
    time("md5+conv per shingle")(hs.selectExpr("sum(size(hs))").collect())
    time("md5 only")(sh.withColumn("hs",
      transform(col("sh"), x => md5(x))).selectExpr("sum(size(hs))").collect())
    val sig = hs.select(col("doc_id") +:
      (0 until 12).map(k => TextOps.affineMin(col("hs"), k).as(s"h$k")): _*)
    time("12 affine mins")(sig.select(sum(col("h0"))).collect())

    // native vs composed surrogate-key expression on the events table
    import graft.functions.Keys
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .repartition(32)
      .withColumn("k", concat_ws("|", col("event_id"), col("user_id"),
        col("event_type"), col("props")))
    for (_ <- 1 to 2) {
      time("md5Key15 composed")(
        ev.select(sum(Keys.md5Key15(col("k")) % 1000)).collect())
      time("md5Key15 native expr")(
        ev.select(sum(Keys.md5Key15Native(col("k")) % 1000)).collect())
    }
    spark.stop()
  }
}
