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
    val K = 12
    // (a) 12 per-k array transforms
    val sigA = hs.select(col("doc_id") +:
      (0 until K).map(k => TextOps.affineMin(col("hs"), k).as(s"h$k")): _*)
    time("sig: 12 transforms")(
      sigA.select((0 until K).map(k => sum(col(s"h$k") % 97)).reduce(_ + _))
        .collect())
    // (b) explode + 12 min aggregates
    val hashedE = sh.select(col("doc_id"), explode(col("sh")).as("x"))
      .withColumn("h", TextOps.tokenHash32(col("x")))
    val sigB = hashedE.groupBy("doc_id").agg(
      min((lit(TextOps.minhashA(0)) * col("h") + lit(TextOps.minhashB(0)))
        % lit(TextOps.MinhashP)).as("h0"),
      (1 until K).map(k =>
        min((lit(TextOps.minhashA(k)) * col("h") + lit(TextOps.minhashB(k)))
          % lit(TextOps.MinhashP)).as(s"h$k")): _*)
    time("sig: explode+groupBy")(
      sigB.select((0 until K).map(k => sum(col(s"h$k") % 97)).reduce(_ + _))
        .collect())
    // (c) one aggregate fold with a K-slot accumulator
    val maxL = Long.MaxValue
    val sigC = hs.withColumn("mins",
      aggregate(col("hs"),
        array_repeat(lit(maxL), K),
        (acc, h) => array((0 until K).map(k =>
          least(get(acc, lit(k)),
            (lit(TextOps.minhashA(k)) * h + lit(TextOps.minhashB(k)))
              % lit(TextOps.MinhashP))): _*)))
      .select(col("doc_id") +:
        (0 until K).map(k => get(col("mins"), lit(k)).as(s"h$k")): _*)
    time("sig: single fold")(
      sigC.select((0 until K).map(k => sum(col(s"h$k") % 97)).reduce(_ + _))
        .collect())

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
