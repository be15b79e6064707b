package graft.tools

import graft.functions.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stage-by-stage timing of the containment witness-search path —
  * isolates which stage dominates t100/t101 on a given corpus.
  * Mirrors NearDup.containmentVerifiedCandidates's r13 structure with
  * inline equivalents (a diagnostic, not a second implementation).
  *   sbt "runMain graft.tools.ProfileWitness [sfDir]"
  */
object ProfileWitness {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tau = 0.9
    val maxDf = graft.operators.NearDup.ContainmentMaxDfDefault
    val spark = graft.GraftSession.perfConfs.foldLeft(
      SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")) {
      case (b, (k, v)) => b.config(k, v)
    }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs  ($r)")
    }

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(32)
      .select(col("doc_id"), col("text"))
    val ex = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 14), " ").as("text"))
    val docs = base.unionByName(ex)
    println(s"[profile] corpus = ${docs.count()} docs")

    import org.apache.spark.sql.expressions.Window
    val pre = docs.withColumn("__tk", TextOps.tokens(col("text")))
      .select(col("doc_id"), TextOps.shingles3(col("__tk")).as("__sh"))
      .filter(size(col("__sh")) > 0)
    val grams = pre.select(col("doc_id").as("__id"),
        explode(col("__sh")).as("__gt"))
      .select(col("__id"), xxhash64(col("__gt")).as("__g1"),
        xxhash64(lit("graft-containment-h2-v2"), col("__gt")).as("__g2"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("grams persist")(grams.count())
    val dfTab = grams.groupBy("__g1", "__g2")
      .agg(count(lit(1)).as("__df"))
    val withDf = grams.join(dfTab, Seq("__g1", "__g2"))
    time("withDf (df agg + join)")(
      withDf.write.format("noop").mode("overwrite").save())
    val uncFlag = col("__df") <= maxDf
    val wId = Window.partitionBy("__id")
      .orderBy(col("__df").asc, col("__g1").asc, col("__g2").asc)
    val wIdAll = wId.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val unc = withDf
      .withColumn("__n", count(lit(1)).over(wIdAll))
      .withColumn("__nunc", sum(when(uncFlag, 1L).otherwise(0L))
        .over(wIdAll))
      .withColumn("__rk", row_number().over(wId))
      .filter(uncFlag)
      .select(col("__id"), col("__g1"), col("__g2"), col("__n"),
        col("__nunc"), col("__rk"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("unc persist (id window)")(unc.count())
    val sizes = unc.groupBy("__id").agg(max(col("__n")).as("__n"))
    time("sizes (agg over cache)")(sizes.count())
    val probes = unc
      .withColumn("__mmin", greatest(lit(1L),
        ceil(col("__n") * tau).cast("long") - 1L))
      .withColumn("__r", col("__nunc") - col("__mmin") + 1L)
      .filter(col("__r") >= 1L)
      .withColumn("__np", least(col("__r") + 1L, col("__nunc")))
      .filter(col("__rk") <= col("__np"))
      .withColumn("__thr", greatest(lit(1L), least(lit(2L),
        col("__np") - col("__nunc") + col("__mmin"))))
      .select(col("__id").as("__x"), col("__g1"), col("__g2"),
        col("__thr"), col("__n").as("__nx"))
    time("probes (filter of cache)")(probes.count())
    val candAll = probes
      .join(unc.select(col("__id").as("__y"), col("__g1"),
        col("__g2")), Seq("__g1", "__g2"))
      .filter(col("__x") =!= col("__y"))
      .groupBy("__x", "__y")
      .agg(count(lit(1)).as("__m"), first(col("__thr")).as("__thr"),
        first(col("__nx")).as("__nx"))
      .filter(col("__m") >= col("__thr"))
      .join(sizes.select(col("__id").as("__y"), col("__n").as("__ny")),
        Seq("__y"))
    val cand = candAll.select("__x", "__y", "__nx", "__ny")
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("cand (probe join + 2-hit)")(cand.count())
    val inter = unc.select(col("__id").as("__x"), col("__g1"),
        col("__g2"))
      .join(cand.select("__x", "__y"), Seq("__x"))
      .join(unc.select(col("__id").as("__y"), col("__g1"),
        col("__g2")), Seq("__y", "__g1", "__g2"))
      .groupBy("__x", "__y").agg(count(lit(1)).as("__ninter"))
    time("verify (doc-keyed join)")(
      inter.write.format("noop").mode("overwrite").save())
    val out = inter.join(cand, Seq("__x", "__y"))
      .select(
        least(col("__x"), col("__y")).as("id_a"),
        greatest(col("__x"), col("__y")).as("id_b"),
        col("__ninter").as("n_inter"),
        when(col("__x") < col("__y"), col("__nx"))
          .otherwise(col("__ny")).as("n_a"),
        when(col("__x") < col("__y"), col("__ny"))
          .otherwise(col("__nx")).as("n_b"))
      .distinct()
      .withColumn("cont_a", round(col("n_inter") / col("n_a"), 6))
      .withColumn("cont_b", round(col("n_inter") / col("n_b"), 6))
      .filter(col("cont_a") >= tau || col("cont_b") >= tau)
    time("pair shaping + distinct")(out.count())
    spark.stop()
  }
}
