package graft.tools

import graft.Tables
import graft.functions.Bpe
import graft.operators.{Chunk, Curate, Decontam, Pack, Quality, Sample}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Usage example + smoke driver for the TRAINING-DATA side: the full
  * corpus pipeline — curate (quality → language → exact → near-dup
  * dedup) → benchmark decontamination (n-gram + embedding) →
  * temperature-mixed sampling → BPE tokenization → fixed-length
  * training sequences — over the sf0.001 testdata, printing the
  * funnel at each stage.
  *   sbt "runMain graft.tools.DemoCorpus [sfDir]"
  */
object DemoCorpus {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables(spark, sfDir, "documents")
    val embs = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    println(s"[corpus] input docs        = ${docs.count()}")

    // 1. curate: quality -> language -> exact dedup -> minhash near-dup
    val curated = Curate.curate(docs, "doc_id", "text")
    println(s"[corpus] curated survivors = ${curated.count()}")

    // 2. decontaminate against a benchmark slice (both signals)
    val joined = curated.join(embs, curated("doc_id") === embs("vec_id"))
      .select(curated("doc_id"), col("text"), col("v"))
    val bench = docs.filter(col("doc_id") % 10 === 0)
      .join(embs, docs("doc_id") === embs("vec_id"))
      .select(col("text"), col("v"))
    val report = Decontam.fullReport(joined, "doc_id", "text", "v",
      bench, "text", "v", n = 5, threshold = 0.9)
    val clean = joined.join(
      report.filter(!col("contaminated")).select("doc_id"), Seq("doc_id"))
    println(s"[corpus] decontaminated    = ${clean.count()}" +
      s" (flagged ${report.filter(col("contaminated")).count()})")

    // 3. LM quality score (CCNet-style perplexity proxy) — keep docs
    // whose char-trigram likelihood under the benchmark-slice LM is
    // above the corpus median
    val lm = Quality.charLmScore(clean, "doc_id", "text",
      bench.select("text"), "text")
    val cut = lm.stat.approxQuantile("avg_logprob", Array(0.5), 0.01)(0)
    val likely = clean.join(
      lm.filter(col("avg_logprob") >= cut).select("doc_id"), Seq("doc_id"))
    println(s"[corpus] LM-quality kept   = ${likely.count()}" +
      f" (median logprob cut $cut%.3f)")

    // 4. temperature-mixed sampling by language
    val withLang = likely.join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .withColumn("n_tok", Bpe.tokenCount(col("text"), Bpe.GateMerges))
    val mixed = Sample.temperatureMixture(withLang, "doc_id", "lang",
      "n_tok", alpha = 0.7, totalBudget = 50000L)
    println(s"[corpus] after mixture     = ${mixed.count()}")

    // 5. tokenize + pack fixed-length training sequences
    val seqs = Pack.packSequences(
      mixed.select(col("doc_id"),
        Bpe.tokenIds(col("text"), Bpe.GateMerges).as("ids")),
      "doc_id", "ids", seqLen = 512)
    val n = seqs.count()
    val full = seqs.filter(col("n_tokens") === 512).count()
    println(s"[corpus] training seqs     = $n ($full full @512 tokens)")

    // bonus: boilerplate-fragment scan via content-defined chunking
    val boiler = Chunk.chunkDupStats(curated, "doc_id", "text",
      rolling = true)
      .agg(round(avg("dup_ratio"), 4).as("avg_chunk_dup_ratio"))
      .collect()(0).getDouble(0)
    println(s"[corpus] avg chunk-dup ratio = $boiler")
    spark.stop()
  }
}
