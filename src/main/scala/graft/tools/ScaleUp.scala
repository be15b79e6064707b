package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scaler for sf1-class validation of the heavy
  * dedup/ANN family: no sf1 testdata ships, so this replicates the
  * sf0.1 tables `factor`× with the two shapes that stress the
  * operators at scale —
  *
  *  - copy k of each document appends a ` rep{k}` marker token: a
  *    NEAR-dup of the original (Jaccard just under 1 for long docs,
  *    legitimately distinct for very short ones) — the realistic
  *    near-dup cluster distribution, ×factor;
  *  - one pathological block: the min-id document duplicated
  *    `pathoDups` times VERBATIM in a far id range — the
  *    mass-duplication pathology the hot-bucket guard exists for
  *    (pathoDups > maxBucket forces the hub-star path);
  *  - embeddings replicate verbatim with offset ids (exact-cosine
  *    clusters of `factor`).
  *
  * All ids/text are pure functions of the source rows — any run
  * produces the identical corpus.
  *
  *   sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sfx 10"
  */
object ScaleUp {

  val CopyStride = 100000000L
  // far beyond any copy-k id (k*CopyStride + doc_id): replica and
  // pathology id ranges must never collide — duplicate doc_ids with
  // different texts would break the unique-id contract of the dedup
  // operators under test
  val PathoBase = 1000000000000L

  def scaleDocs(docs: DataFrame, factor: Int, pathoDups: Int): DataFrame = {
    require(factor >= 1 && pathoDups >= 0)
    val reps = docs
      .withColumn("__k", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("doc_id", col("doc_id") + col("__k") * lit(CopyStride))
      .withColumn("text",
        when(col("__k") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("__k"))))
      .drop("__k")
    val patho = docs.orderBy(col("doc_id").asc).limit(1)
      .withColumn("__k", explode(sequence(lit(0), lit(pathoDups - 1))))
      .withColumn("doc_id", lit(PathoBase) + col("__k"))
      .drop("__k")
    if (pathoDups == 0) reps else reps.unionByName(patho)
  }

  def scaleEmbeddings(embs: DataFrame, factor: Int): DataFrame =
    embs
      .withColumn("__k", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("vec_id", col("vec_id") + col("__k") * lit(CopyStride))
      .drop("__k")

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args.take(3)
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scaleDocs(Tables(spark, srcDir, "documents"), factor, pathoDups = 2048)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    scaleEmbeddings(Tables(spark, srcDir, "embeddings"), factor)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // Bench warms up on region; everything else the heavy family needs
    // is above
    Tables(spark, srcDir, "region")
      .write.mode("overwrite").parquet(s"$outDir/region.parquet")
    println(s"[scaleup] wrote ${factor}x corpus to $outDir")
    spark.stop()
  }
}
