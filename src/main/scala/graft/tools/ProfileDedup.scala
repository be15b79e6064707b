package graft.tools

import graft.functions.TextOps
import graft.operators.NearDup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stage-by-stage timing of the composed MinHash dedup pipeline —
  * isolates which stage dominates t16/t19/t21/t24 on a given corpus.
  * Mirrors NearDup.dedupByMinhash's structure with inline equivalents
  * of its private stages (a diagnostic, not a second implementation).
  *   sbt "runMain graft.tools.ProfileDedup [sfDir]"
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sfx10")
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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[profile] corpus = ${docs.count()} docs")

    // stage 1: shingle frame (what dedupByMinhash persists)
    val sh = docs.withColumn("__tk", TextOps.tokens(col("text")))
      .select(col("doc_id"), TextOps.shingles3Raw(col("__tk")).as("__shraw"),
        size(col("__tk")).as("__ntk"), md5(col("text")).as("__fp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("shingles build+persist")(sh.count())

    // stage 2: exact-class collapse
    val eligible = sh.filter(col("__ntk") >= 3)
    val reps = eligible.groupBy("__fp").agg(min(col("doc_id")).as("__rep"))
    val removedExact = eligible.join(reps, "__fp")
      .filter(col("doc_id") =!= col("__rep"))
      .select(col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("exact-class collapse")(removedExact.count())
    val shReps = sh.join(removedExact, Seq("doc_id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("rep shingle frame")(shReps.count())

    // stage 3: banded signatures (over reps, as the operator does).
    // NOTE the "signatures" timing below is a LOWER BOUND only:
    // count() lets Catalyst prune the projection, so the md5+fold work
    // is really paid in the "banding" row (which consumes the values)
    val hs = shReps.filter(col("__ntk") >= 3)
      .select(col("doc_id"),
        transform(col("__shraw"), x => TextOps.tokenHash32(x)).as("__hs"))
    val k = 12
    val sig = hs.withColumn("__mins",
      aggregate(col("__hs"), array_repeat(lit(Long.MaxValue), k),
        (acc, h) => array((0 until k).map(p =>
          least(get(acc, lit(p)),
            (lit(TextOps.minhashA(p)) * h + lit(TextOps.minhashB(p)))
              % lit(TextOps.MinhashP))): _*)))
      .select(col("doc_id") +:
        (0 until k).map(p => get(col("__mins"), lit(p)).as(s"h$p")): _*)
    time("signatures (hash+fold)")(sig.count())
    val bandStructs = (0 until 4).map { b =>
      val cols = (0 until 3).map(r => col(s"h${3 * b + r}").cast("string"))
      struct(lit(b).as("band_id"), md5(concat_ws(",", cols: _*)).as("band_hash"))
    }
    val banded = sig.select(col("doc_id"),
      explode(array(bandStructs: _*)).as("bd"))
      .select(col("doc_id"), col("bd.band_id").as("band_id"),
        col("bd.band_hash").as("band_hash"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("banding")(banded.count())

    // stage 4: candidate pairs
    val cands = NearDup.candidatePairs(banded, "doc_id", 1024)
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("candidate pairs")(cands.count())

    // stage 5: exact-Jaccard verify (single-intersect form with the
    // size-ratio prefilter, as verifiedMinhashPairs computes it)
    val shD = shReps.select(col("doc_id"),
      array_distinct(col("__shraw")).as("__sh"))
      .withColumn("__sz", size(col("__sh")))
    val verified = cands
      .join(shD.select(col("doc_id").as("d1"), col("__sh").as("__sh1"),
        col("__sz").as("__sz1")), "d1")
      .join(shD.select(col("doc_id").as("d2"), col("__sh").as("__sh2"),
        col("__sz").as("__sz2")), "d2")
      .filter(col("__sz1") >= col("__sz2") * 0.8 &&
        col("__sz2") >= col("__sz1") * 0.8)
      .withColumn("__i", size(array_intersect(col("__sh1"), col("__sh2"))))
      .filter(col("__i").cast("double") /
        (col("__sz1") + col("__sz2") - col("__i")) >= 0.8)
      .select(col("d1"), col("d2"))
    time("exact-Jaccard verify")(verified.count())

    // stage 6: the full operator, for reference
    spark.catalog.clearCache()
    graft.CacheRegistry.release()
    time("FULL dedupByMinhash")(
      NearDup.dedupByMinhash(docs, "doc_id", "text", 0.8).count())
    spark.stop()
  }
}
