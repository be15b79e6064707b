package graft.tools

import graft.functions.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stage-by-stage timing of the containment witness-search path —
  * isolates which stage dominates t101 on a given corpus. Mirrors
  * NearDup.containmentWitnessDropIds's structure with inline
  * equivalents (a diagnostic, not a second implementation).
  *   sbt "runMain graft.tools.ProfileWitness [sfDir]"
  */
object ProfileWitness {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val tau = 0.9
    val maxDf = graft.operators.NearDup.ContainmentMaxDfDefault
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

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs  ($r)")
    }

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val ex = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 14), " ").as("text"))
    val docs = base.unionByName(ex)
    println(s"[profile] corpus = ${docs.count()} docs")

    val pre = docs.withColumn("__tk", TextOps.tokens(col("text")))
      .select(col("doc_id"), TextOps.shingles3(col("__tk")).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col("doc_id"), col("__sh"),
        size(col("__sh")).cast("long").as("n_grams"))
    val grams = pre.select(col("doc_id").as("__id"),
        explode(col("__sh")).as("__gt"))
      .select(col("__id"), xxhash64(col("__gt")).as("__g1"),
        xxhash64(lit("graft-containment-h2-v2"), col("__gt")).as("__g2"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("grams build+persist")(grams.count())

    val dfTab = grams.groupBy("__g1", "__g2").agg(count(lit(1)).as("__df"))
    val unc = grams.join(dfTab, Seq("__g1", "__g2"))
      .filter(col("__df") <= maxDf)
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("df join + cap + persist")(unc.count())

    val sizes = pre.select(col("doc_id").as("__id"),
      col("n_grams").as("__n"))
    val budget = sizes
      .join(unc.groupBy("__id").agg(count(lit(1)).as("__nunc")), Seq("__id"))
      .withColumn("__mmin", greatest(lit(1L),
        ceil(col("__n") * tau).cast("long") - 1L))
      .withColumn("__r", col("__nunc") - col("__mmin") + 1L)
      .filter(col("__r") >= 1L)
      .withColumn("__np", least(col("__r") + 1L, col("__nunc")))
      .withColumn("__thr", greatest(lit(1L), least(lit(2L),
        col("__np") - col("__nunc") + col("__mmin"))))
      .select(col("__id"), col("__np"), col("__thr"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("budget")(budget.count())

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("__id")
      .orderBy(col("__df").asc, col("__g1").asc, col("__g2").asc)
    val probes = unc.withColumn("__rk", row_number().over(w))
      .join(budget, Seq("__id"))
      .filter(col("__rk") <= col("__np"))
      .select(col("__id").as("__x"), col("__g1"), col("__g2"),
        col("__thr"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("probes (window+rank)")(probes.count())

    val candRaw = probes
      .join(unc.select(col("__id").as("__y"), col("__g1"), col("__g2")),
        Seq("__g1", "__g2"))
      .filter(col("__x") =!= col("__y"))
    val candAgg = candRaw.groupBy("__x", "__y")
      .agg(count(lit(1)).as("__m"), first(col("__thr")).as("__thr"))
      .filter(col("__m") >= col("__thr"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("candidate join+agg+thr")(candAgg.count())

    val cand = candAgg
      .join(sizes.select(col("__id").as("__x"), col("__n").as("__nx")),
        Seq("__x"))
      .join(sizes.select(col("__id").as("__y"), col("__n").as("__ny")),
        Seq("__y"))
      .filter(col("__ny") > col("__nx") ||
        (col("__ny") === col("__nx") && col("__y") < col("__x")))
      .select("__x", "__y")
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("killer filter")(cand.count())

    val inter = unc.select(col("__id").as("__x"), col("__g1"), col("__g2"))
      .join(cand, Seq("__x"))
      .join(unc.select(col("__id").as("__y"), col("__g1"), col("__g2")),
        Seq("__y", "__g1", "__g2"))
      .groupBy("__x", "__y").agg(count(lit(1)).as("__ninter"))
    val drops = inter
      .join(sizes.select(col("__id").as("__x"), col("__n").as("__nx")),
        Seq("__x"))
      .filter(round(col("__ninter") / col("__nx"), 6) >= tau)
      .select(col("__x")).distinct()
    time("verify + drops")(drops.count())

    time("anti-join survivors")(
      docs.join(drops.withColumnRenamed("__x", "doc_id"),
        Seq("doc_id"), "left_anti").count())
    spark.stop()
  }
}
