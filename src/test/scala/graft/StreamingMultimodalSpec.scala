package graft

import graft.multimodal.Multimodal
import graft.streaming.Incremental
import org.apache.spark.sql.functions._

/** Streaming incremental contract (§2.9) + multimodal plumbing. */
class StreamingMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("bronzeToSilver: AvailableNow drain, keyed upsert, incremental") {
    val root = tmpDir("stream")
    val bronzeDir = s"$root/bronze"
    new java.io.File(bronzeDir).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/part-1.jsonl"),
      Seq("""{"idMember": 1, "v": "a"}""",
        """{"idMember": 1, "v": "a-dup"}""",
        """{"idMember": 2, "v": "b"}""",
        """{"v": "no-key"}""").mkString("\n").getBytes)

    val keyExpr = "CAST(get_json_object(raw_data, '$.idMember') AS LONG)"
    Incremental.bronzeToSilver(spark, bronzeDir, s"$root/silver",
      s"$root/ckpt", keyExpr)
    val first = spark.read.parquet(s"$root/silver")
    assert(first.count() == 2) // dup collapsed, null key dropped

    // second file arrives: only the new data is processed (checkpoint),
    // existing key 1 is updated, key 3 inserted
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/part-2.jsonl"),
      Seq("""{"idMember": 1, "v": "a2"}""",
        """{"idMember": 3, "v": "c"}""").mkString("\n").getBytes)
    Incremental.bronzeToSilver(spark, bronzeDir, s"$root/silver",
      s"$root/ckpt", keyExpr)
    val second = spark.read.parquet(s"$root/silver")
    assert(second.count() == 3)
    assert(second.filter(col("natural_key") === 1)
      .select(get_json_object(col("raw_data"), "$.v")).collect()(0)
      .getString(0) == "a2")
  }

  test("bronzeToSilver: content-derived versioning beats file order") {
    val root = tmpDir("stream-v")
    val bronzeDir = s"$root/bronze"
    new java.io.File(bronzeDir).mkdirs()
    // the NEWER record (by updated_at) appears FIRST in the file: with
    // content versioning it must still win over the later line
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/part-1.jsonl"),
      Seq("""{"id": 1, "v": "newer", "updated_at": "2026-02-01T00:00:00Z"}""",
        """{"id": 1, "v": "older", "updated_at": "2026-01-01T00:00:00Z"}""")
        .mkString("\n").getBytes)
    Incremental.bronzeToSilver(spark, bronzeDir, s"$root/silver",
      s"$root/ckpt", "CAST(get_json_object(raw_data, '$.id') AS LONG)",
      versionExpr = Some("get_json_object(raw_data, '$.updated_at')"))
    val got = spark.read.parquet(s"$root/silver").collect()
    assert(got.length == 1)
    assert(got(0).getAs[String]("raw_data").contains("\"newer\""))
  }

  test("neardupStream: two drains == one batch dedup of the union") {
    import graft.operators.NearDup
    val root = tmpDir("stream-nd")
    val bronzeDir = s"$root/bronze"
    new java.io.File(bronzeDir).mkdirs()
    val tA = "alpha beta gamma delta epsilon zeta eta theta"
    val tC = "one two three four five six seven eight nine"
    val tE = "totally different words nothing shared here at all"
    def line(id: Long, text: String) =
      s"""{"id": $id, "text": "$text"}"""

    // drain 1: doc 2 is a dup of doc 1 within the batch
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day1.jsonl"),
      Seq(line(1, tA), line(2, tA), line(3, tC)).mkString("\n").getBytes)
    val idExpr = "CAST(get_json_object(raw_data, '$.id') AS LONG)"
    val textExpr = "get_json_object(raw_data, '$.text')"
    Incremental.neardupStream(spark, bronzeDir, s"$root/corpus",
      s"$root/bands", s"$root/ckpt", idExpr, textExpr)
    assert(spark.read.parquet(s"$root/corpus").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))

    // drain 2: doc 4 duplicates EXISTING doc 1 (cross-drain, caught
    // via the materialized band index), 5 is new, 6 duplicates 5
    // in-batch
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day2.jsonl"),
      Seq(line(4, tA), line(5, tE), line(6, tE)).mkString("\n").getBytes)
    Incremental.neardupStream(spark, bronzeDir, s"$root/corpus",
      s"$root/bands", s"$root/ckpt", idExpr, textExpr)
    val streamed = spark.read.parquet(s"$root/corpus")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed == Seq(1L, 3L, 5L))

    // equivalence: one batch dedup over the union of both days
    val union = Seq((1L, tA), (2L, tA), (3L, tC), (4L, tA), (5L, tE),
      (6L, tE)).toDF("doc_id", "text")
    val batch = NearDup.dedupByMinhash(union, "doc_id", "text", 0.8)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed == batch)

    // the band index covers exactly the accepted corpus (signatures
    // were computed once per accepted doc, at acceptance time)
    val bandIds = spark.read.parquet(s"$root/bands")
      .select("doc_id").distinct().collect().map(_.getLong(0)).sorted
    assert(bandIds.toSeq == Seq(1L, 3L, 5L))
  }

  test("neardupStream: bands-written-corpus-lost replay heals; " +
    "band leaves stay duplicate-free") {
    import graft.operators.NearDup
    // the crash window the scaladoc documents: bands for the would-be
    // survivors land (batch=0 leaf), the corpus append is lost, the
    // batch replays from the checkpoint. The phantom band rows have no
    // corpus doc, so the cross verify's inner join against corpus text
    // drops them — the replay must reconstruct the same survivors and
    // OVERWRITE the same leaf instead of duplicating band rows (dup
    // rows inflate bucket counts and silently hub-collapse real
    // candidates past maxBucket).
    val root = tmpDir("stream-nd-crash")
    val bronzeDir = s"$root/bronze"
    new java.io.File(bronzeDir).mkdirs()
    val tA = "alpha beta gamma delta epsilon zeta eta theta"
    val tC = "one two three four five six seven eight nine"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day1.jsonl"),
      Seq(s"""{"id": 1, "text": "$tA"}""",
        s"""{"id": 2, "text": "$tC"}""").mkString("\n").getBytes)
    // simulate the crash point: survivors' bands already on disk
    NearDup.minhashBands(Seq((1L, tA), (2L, tC)).toDF("doc_id", "text"),
      "doc_id", "text", 12, 4)
      .write.mode("overwrite").parquet(s"$root/bands/batch=0")
    // fresh checkpoint replays the files as batch 0 again
    Incremental.neardupStream(spark, bronzeDir, s"$root/corpus",
      s"$root/bands", s"$root/ckpt",
      "CAST(get_json_object(raw_data, '$.id') AS LONG)",
      "get_json_object(raw_data, '$.text')")
    val corpus = spark.read.parquet(s"$root/corpus")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(corpus == Seq(1L, 2L),
      s"replay must land the survivors, got $corpus")
    // leaf overwritten, not appended: one row per (doc, band_id)
    val dup = spark.read.parquet(s"$root/bands")
      .groupBy("doc_id", "band_id").count()
      .filter(col("count") > 1).count()
    assert(dup == 0L, "replay duplicated band rows")
  }

  test("containmentStream: excerpts drop vs history via the gram-index " +
    "asset; late supersets and fresh docs stay") {
    import graft.operators.NearDup
    val root = tmpDir("stream-cont")
    val bronzeDir = s"$root/bronze"
    new java.io.File(bronzeDir).mkdirs()
    val src = "a b c d e f g h i j"
    def line(id: Long, text: String) =
      s"""{"id": $id, "text": "$text"}"""
    val idExpr = "CAST(get_json_object(raw_data, '$.id') AS LONG)"
    val textExpr = "get_json_object(raw_data, '$.text')"
    // drain 1: doc 2 is an excerpt of doc 1 IN BATCH
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day1.jsonl"),
      Seq(line(1, src), line(2, "a b c d e")).mkString("\n").getBytes)
    Incremental.containmentStream(spark, bronzeDir, s"$root/corpus",
      s"$root/index", s"$root/ckpt", idExpr, textExpr, tau = 0.9)
    assert(spark.read.parquet(s"$root/corpus").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L))
    // drain 2: 3 = excerpt of SHIPPED 1 (drops via the index), 4 =
    // fresh (stays), 5 = superset of 1 (history never kills a richer
    // doc — stays)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day2.jsonl"),
      Seq(line(3, "c d e f g"), line(4, "x y z w v u"),
        line(5, src + " k l m")).mkString("\n").getBytes)
    Incremental.containmentStream(spark, bronzeDir, s"$root/corpus",
      s"$root/index", s"$root/ckpt", idExpr, textExpr, tau = 0.9)
    val got = spark.read.parquet(s"$root/corpus")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 4L, 5L))
    // the index asset covers exactly the accepted corpus
    val idxIds = spark.read.parquet(s"$root/index")
      .select("doc_id").distinct().collect().map(_.getLong(0)).sorted
    assert(idxIds.toSeq == Seq(1L, 4L, 5L))
  }

  test("containmentStream: index-written-corpus-lost replay heals — " +
    "the self-pair guard stops ghost rows from dropping their own doc") {
    import graft.operators.NearDup
    val root = tmpDir("stream-cont-crash")
    val bronzeDir = s"$root/bronze"
    new java.io.File(bronzeDir).mkdirs()
    val docs = Seq((1L, "a b c d e f g h"), (2L, "p q r s t u v"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day1.jsonl"),
      docs.map { case (id, t) => s"""{"id": $id, "text": "$t"}""" }
        .mkString("\n").getBytes)
    // crash point: survivors' gram rows already in the batch-0 leaf,
    // corpus append lost. Without the __inid =!= __exid guard each
    // doc would self-match its ghost at cont=1 and drop forever.
    NearDup.containmentGramIndex(docs.toDF("doc_id", "text"),
      "doc_id", "text")
      .write.mode("overwrite").parquet(s"$root/index/batch=0")
    Incremental.containmentStream(spark, bronzeDir, s"$root/corpus",
      s"$root/index", s"$root/ckpt",
      "CAST(get_json_object(raw_data, '$.id') AS LONG)",
      "get_json_object(raw_data, '$.text')", tau = 0.9)
    val corpus = spark.read.parquet(s"$root/corpus")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(corpus == Seq(1L, 2L),
      s"replay must land the survivors, got $corpus")
    // leaf overwritten, not appended: one row per (doc, gram)
    val dup = spark.read.parquet(s"$root/index")
      .groupBy("doc_id", "gram").count()
      .filter(col("count") > 1).count()
    assert(dup == 0L, "replay duplicated index rows")
  }

  test("signatureDedupStream: two drains == one batch signature dedup") {
    import graft.operators.NearDup
    val root = tmpDir("stream-sig")
    val bronzeDir = s"$root/bronze"
    new java.io.File(bronzeDir).mkdirs()
    // raw 64-bit perceptual signatures (what an upstream dHash /
    // audioFingerprint job would emit)
    val sA = 0x00000000000000FFL
    val sC = 0x0F0F0F0F0F0F0F0FL
    val sE = 0x7777777777777777L
    def line(id: Long, sig: Long) = s"""{"id": $id, "sig": $sig}"""
    val idExpr = "CAST(get_json_object(raw_data, '$.id') AS LONG)"
    val sigExpr = "CAST(get_json_object(raw_data, '$.sig') AS LONG)"

    // drain 1: 2 is a hamming-1 near-dup of 1 within the batch
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day1.jsonl"),
      Seq(line(1, sA), line(2, sA ^ 1L), line(3, sC))
        .mkString("\n").getBytes)
    Incremental.signatureDedupStream(spark, bronzeDir, s"$root/corpus",
      s"$root/bands", s"$root/ckpt", idExpr, sigExpr)
    assert(spark.read.parquet(s"$root/corpus").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))

    // drain 2: 4 near-dups EXISTING 1 (cross-drain via the band
    // index), 5 is new, 6 near-dups 5 in-batch
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day2.jsonl"),
      Seq(line(4, sA ^ 2L), line(5, sE), line(6, sE ^ 4L))
        .mkString("\n").getBytes)
    Incremental.signatureDedupStream(spark, bronzeDir, s"$root/corpus",
      s"$root/bands", s"$root/ckpt", idExpr, sigExpr)
    val streamed = spark.read.parquet(s"$root/corpus")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed == Seq(1L, 3L, 5L))

    // equivalence: one batch signature dedup over the union
    val union = Seq((1L, sA), (2L, sA ^ 1L), (3L, sC), (4L, sA ^ 2L),
      (5L, sE), (6L, sE ^ 4L)).toDF("doc_id", "sig")
    val batch = NearDup.dedupBySignature(union, "doc_id", "sig")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed == batch)

    // band index covers exactly the accepted corpus, carrying sigs
    val bandIds = spark.read.parquet(s"$root/bands")
      .select("doc_id").distinct().collect().map(_.getLong(0)).sorted
    assert(bandIds.toSeq == Seq(1L, 3L, 5L))
  }

  test("signatureDedupStream: bands-written-corpus-lost replay heals, never drops") {
    import graft.operators.NearDup
    // the r7 review finding: after a crash BETWEEN the band-index
    // write and the corpus append, the replayed batch sees its own
    // survivors' ghost band rows on the existing side; a hamming-0
    // self-match would drop them forever. The in_id =!= ex_id guard
    // makes the replay reconstruct instead.
    val root = tmpDir("stream-sig-crash")
    val bronzeDir = s"$root/bronze"
    new java.io.File(bronzeDir).mkdirs()
    val sigs = Seq((1L, 0x00000000000000FFL), (2L, 0x0F0F0F0F0F0F0F0FL))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day1.jsonl"),
      sigs.map { case (id, sg) => s"""{"id": $id, "sig": $sg}""" }
        .mkString("\n").getBytes)
    val idExpr = "CAST(get_json_object(raw_data, '$.id') AS LONG)"
    val sigExpr = "CAST(get_json_object(raw_data, '$.sig') AS LONG)"

    // simulate the crash point: bands for the would-be survivors are
    // already on disk, the corpus append never happened
    NearDup.signatureBands(sigs.toDF("doc_id", "sig"), "doc_id", "sig")
      .write.mode("overwrite").parquet(s"$root/bands/batch=0")
    // fresh checkpoint replays the files as a new batch
    Incremental.signatureDedupStream(spark, bronzeDir, s"$root/corpus",
      s"$root/bands", s"$root/ckpt", idExpr, sigExpr)
    val corpus = spark.read.parquet(s"$root/corpus")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(corpus == Seq(1L, 2L),
      s"replay must land the survivors, got $corpus")
  }

  test("multimodal: scene changes + video near-dup via frame dHash") {
    import Multimodal._
    // scene cuts: 4 solid frames, one big jump at frame 2
    val grays = Seq(100, 110, 220, 215)
    val media = Seq(MediaRecord(1L, "video", "image/gif", 16, 16, 400L,
      gifAnimated(grays.map(g => Array.fill(16 * 16)(g)), 16, 16))).toDS()
    val cuts = sceneChanges(
      frameStats(sampleFramesDecoded(media, 100L, codec = GifCodec)),
      threshold = 50.0).collect()
    assert(cuts.map(r => (r.getInt(1), r.getDouble(3))).toSeq ==
      Seq((2, 110.0)))

    // frame-0 dHash: two videos sharing frame 0 collapse, a distinct
    // one survives — the composed video near-dup path
    val p0 = Array.tabulate(72)(j => (j * 7) % 251)
    val p1 = Array.tabulate(72)(j => 250 - (j * 7) % 251)
    val filler = Array.fill(72)(128)
    def vid(id: Long, first: Array[Int]) =
      MediaRecord(id, "video", "image/gif", 9, 8, 200L,
        gifAnimated(Seq(first, filler), 9, 8))
    val vids = Seq(vid(1L, p0), vid(2L, p0), vid(3L, p1)).toDS()
    val firsts = sampleFramesDecoded(vids, 100L, codec = GifCodec)
      .filter(col("frame_idx") === 0)
    val sigs = decodeFrameGray(firsts).toDF()
      .withColumn("dhash", graft.functions.ImageOps.dHash("gray"))
      .select(col("media_id").as("doc_id"), col("dhash"))
    val kept = graft.operators.NearDup
      .dedupBySignature(sigs, "doc_id", "dhash", maxHamming = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("curateStream: two drains == one batch curate of the union") {
    import graft.operators.Curate
    val root = tmpDir("stream-cu")
    val bronzeDir = s"$root/bronze"
    new java.io.File(bronzeDir).mkdirs()
    // pass the row-local gates: >= 20 tokens, stopword ratio <= 0.15
    // (one 'the' in 25), en stopword signal
    def good(tag: String) = (1 to 24).map(i => s"$tag$i").mkString(" ") +
      " the"
    val g1 = good("alpha")
    val g2 = good("omega")
    val short = "way too short the"              // fails quality gate
    val und = (1 to 24).map(i => s"und$i").mkString(" ") + " und25"
    def line(id: Long, text: String) = s"""{"id": $id, "text": "$text"}"""
    val idExpr = "CAST(get_json_object(raw_data, '$.id') AS LONG)"
    val textExpr = "get_json_object(raw_data, '$.text')"

    // drain 1: 2 dups 1 in-batch; 3 fails quality; 4 fails lang-id
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day1.jsonl"),
      Seq(line(1, g1), line(2, g1), line(3, short), line(4, und))
        .mkString("\n").getBytes)
    Incremental.curateStream(spark, bronzeDir, s"$root/corpus",
      s"$root/bands", s"$root/ckpt", idExpr, textExpr)
    assert(spark.read.parquet(s"$root/corpus").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L))

    // drain 2: 5 duplicates EXISTING 1 (via the band index); 6 is new
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day2.jsonl"),
      Seq(line(5, g1), line(6, g2)).mkString("\n").getBytes)
    Incremental.curateStream(spark, bronzeDir, s"$root/corpus",
      s"$root/bands", s"$root/ckpt", idExpr, textExpr)
    val streamed = spark.read.parquet(s"$root/corpus")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed == Seq(1L, 6L))

    // equivalence: one batch curate over the union of both days
    val union = Seq((1L, g1), (2L, g1), (3L, short), (4L, und),
      (5L, g1), (6L, g2)).toDF("doc_id", "text")
    val batch = Curate.curate(union, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed == batch)
    // rejected docs never reached the band index
    val bandIds = spark.read.parquet(s"$root/bands")
      .select("doc_id").distinct().collect().map(_.getLong(0)).sorted
    assert(bandIds.toSeq == Seq(1L, 6L))
  }

  test("embeddingDedupStream: two drains == one batch dedup of the union") {
    import graft.operators.NearDup
    val root = tmpDir("stream-ed")
    val bronzeDir = s"$root/bronze"
    new java.io.File(bronzeDir).mkdirs()
    // unit-ish vectors: vA ~ vA2 (cosine ~1), vB and vC unrelated
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(8)(r.nextGaussian())
    }
    val vA = vec(1)
    val vA2 = vA.map(_ * 1.01) // near-parallel: cosine ~ 1
    val vB = vec(2)
    val vC = vec(3)
    def line(id: Long, v: Seq[Double]) =
      s"""{"id": $id, "vec": [${v.mkString(", ")}]}"""
    val idExpr = "CAST(get_json_object(raw_data, '$.id') AS LONG)"
    val vecExpr = "from_json(get_json_object(raw_data, '$.vec'), 'array<double>')"

    // drain 1: 2 duplicates 1 in-batch
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day1.jsonl"),
      Seq(line(1, vA), line(2, vA2), line(3, vB)).mkString("\n").getBytes)
    Incremental.embeddingDedupStream(spark, bronzeDir, s"$root/corpus",
      s"$root/bands", s"$root/ckpt", idExpr, vecExpr,
      threshold = 0.99, dims = 8)
    assert(spark.read.parquet(s"$root/corpus").select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))

    // drain 2: 4 duplicates EXISTING 1 (via the band index), 5 is new
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day2.jsonl"),
      Seq(line(4, vA), line(5, vC)).mkString("\n").getBytes)
    Incremental.embeddingDedupStream(spark, bronzeDir, s"$root/corpus",
      s"$root/bands", s"$root/ckpt", idExpr, vecExpr,
      threshold = 0.99, dims = 8)
    val streamed = spark.read.parquet(s"$root/corpus")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed == Seq(1L, 3L, 5L))

    // equivalence with one batch dedup over the union
    val union = Seq((1L, vA), (2L, vA2), (3L, vB), (4L, vA), (5L, vC))
      .toDF("vec_id", "vec")
    val batch = NearDup.dedupByEmbedding(union, "vec_id", "vec",
      threshold = 0.99, dims = 8)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed == batch)
  }

  test("semanticCellsStream: two drains == one batch SemDeDup of the union") {
    import graft.operators.NearDup
    val root = tmpDir("stream-sc")
    val bronzeDir = s"$root/bronze"
    new java.io.File(bronzeDir).mkdirs()
    Seq((0L, Seq(1.0, 0.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("cent_id", "cv").write.parquet(s"$root/cents")
    val v1 = Seq(1.0, 0.0, 0.0, 0.0)
    val v2 = Seq(0.99, 0.01, 0.0, 0.0)  // cosine(v1, v2) ~ 1: dup
    val v3 = Seq(0.0, 1.0, 0.0, 0.0)
    val v4 = Seq(0.98, 0.02, 0.0, 0.0)  // dup of EXISTING 1
    val v5 = Seq(0.0, 0.9, 0.2, 0.0)    // cosine(v3, v5) ~ 0.976: dup
    val v6 = Seq(0.0, 0.0, 1.0, 0.0)    // orthogonal: fresh
    def line(id: Long, v: Seq[Double]) =
      s"""{"id": $id, "vec": [${v.mkString(", ")}]}"""
    val idExpr = "CAST(get_json_object(raw_data, '$.id') AS LONG)"
    val vecExpr =
      "from_json(get_json_object(raw_data, '$.vec'), 'array<double>')"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day1.jsonl"),
      Seq(line(1, v1), line(2, v2), line(3, v3)).mkString("\n").getBytes)
    Incremental.semanticCellsStream(spark, bronzeDir, s"$root/corpus",
      s"$root/index", s"$root/cents", s"$root/ckpt", idExpr, vecExpr,
      threshold = 0.95)
    assert(spark.read.parquet(s"$root/corpus").select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day2.jsonl"),
      Seq(line(4, v4), line(5, v5), line(6, v6)).mkString("\n").getBytes)
    Incremental.semanticCellsStream(spark, bronzeDir, s"$root/corpus",
      s"$root/index", s"$root/cents", s"$root/ckpt", idExpr, vecExpr,
      threshold = 0.95)
    val streamed = spark.read.parquet(s"$root/corpus")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed == Seq(1L, 3L, 6L))
    // equivalence with the one-shot batch operator over the union
    val cents = spark.read.parquet(s"$root/cents")
    val union = Seq((1L, v1), (2L, v2), (3L, v3), (4L, v4), (5L, v5),
      (6L, v6)).toDF("vec_id", "vec")
    val batch = NearDup.dedupBySemanticCells(union, "vec_id", "vec",
      cents, "cent_id", "cv", threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed == batch)
    // the assignment index covers exactly the accepted corpus
    val idxIds = spark.read.parquet(s"$root/index")
      .select("vec_id").distinct().collect().map(_.getLong(0)).sorted
    assert(idxIds.toSeq == Seq(1L, 3L, 6L))
  }

  test("semanticCellsStream: index-written-corpus-lost replay heals — " +
    "the self-pair guard stops ghost assignments at cosine 1") {
    import graft.operators.Ann
    val root = tmpDir("stream-sc-crash")
    val bronzeDir = s"$root/bronze"
    new java.io.File(bronzeDir).mkdirs()
    Seq((0L, Seq(1.0, 0.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("cent_id", "cv").write.parquet(s"$root/cents")
    val docs = Seq((1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day1.jsonl"),
      docs.map { case (id, v) =>
        s"""{"id": $id, "vec": [${v.mkString(", ")}]}"""
      }.mkString("\n").getBytes)
    // crash point: assignments already in the batch-0 leaf, corpus
    // append lost. Without the __id2 =!= __xid guard each doc would
    // self-match its ghost at cosine 1 and drop forever.
    Ann.ivfAssign(docs.toDF("vec_id", "vec"), "vec_id", "vec",
      spark.read.parquet(s"$root/cents"), "cent_id", "cv")
      .write.mode("overwrite").parquet(s"$root/index/batch=0")
    Incremental.semanticCellsStream(spark, bronzeDir, s"$root/corpus",
      s"$root/index", s"$root/cents", s"$root/ckpt",
      "CAST(get_json_object(raw_data, '$.id') AS LONG)",
      "from_json(get_json_object(raw_data, '$.vec'), 'array<double>')",
      threshold = 0.95)
    val corpus = spark.read.parquet(s"$root/corpus")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(corpus == Seq(1L, 2L),
      s"replay must land the survivors, got $corpus")
    val dup = spark.read.parquet(s"$root/index")
      .groupBy("vec_id", "cell").count()
      .filter(col("count") > 1).count()
    assert(dup == 0L, "replay duplicated index rows")
  }

  test("containmentStream: fully-committed batch replay (commit lost) " +
    "skips the leaf overwrite instead of wiping accepted gram rows") {
    import graft.operators.NearDup
    val root = tmpDir("stream-cont-commitlost")
    val bronzeDir = s"$root/bronze"
    new java.io.File(bronzeDir).mkdirs()
    val src = "a b c d e f g h i j"
    def line(id: Long, text: String) =
      s"""{"id": $id, "text": "$text"}"""
    val idExpr = "CAST(get_json_object(raw_data, '$.id') AS LONG)"
    val textExpr = "get_json_object(raw_data, '$.text')"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day1.jsonl"),
      Seq(line(1, src), line(2, "p q r s t u v")).mkString("\n").getBytes)
    // the destructive window: BOTH the index leaf and the corpus
    // append landed, only the checkpoint commit was lost. The replay
    // recomputes an EMPTY survivor set (fresh is emptied by the
    // corpus anti-join); overwriting batch=0 with it would delete the
    // accepted docs' gram rows while the corpus keeps the docs —
    // every later batch would then miss containment dups against them.
    val docs = Seq((1L, src), (2L, "p q r s t u v")).toDF("doc_id", "text")
    NearDup.containmentGramIndex(docs, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$root/index/batch=0")
    docs.write.mode("append").parquet(s"$root/corpus")
    Incremental.containmentStream(spark, bronzeDir, s"$root/corpus",
      s"$root/index", s"$root/ckpt", idExpr, textExpr, tau = 0.9)
    // the leaf survived the replay — and no corpus dup either
    assert(spark.read.parquet(s"$root/index").select("doc_id")
      .distinct().collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L), "replay wiped the accepted docs' index leaf")
    assert(spark.read.parquet(s"$root/corpus").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // and the healed index still does its job: a later excerpt of the
    // shipped doc drops against history
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day2.jsonl"),
      Seq(line(3, "c d e f g")).mkString("\n").getBytes)
    Incremental.containmentStream(spark, bronzeDir, s"$root/corpus",
      s"$root/index", s"$root/ckpt", idExpr, textExpr, tau = 0.9)
    assert(spark.read.parquet(s"$root/corpus").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
      "excerpt must still drop against the preserved index")
  }

  test("containmentStream with the (gram, df) asset: capped survivors " +
    "match the index-aggregated cap; leaves sum to the full recount") {
    import graft.operators.NearDup
    val b = (1 to 12).map(i => s"b$i").mkString(" ")
    def line(id: Long, text: String) =
      s"""{"id": $id, "text": "$text"}"""
    val idExpr = "CAST(get_json_object(raw_data, '$.id') AS LONG)"
    val textExpr = "get_json_object(raw_data, '$.text')"
    val day1 = Seq(line(1, s"$b d1 d2 d3 d4"), line(2, s"$b e1"),
      line(3, s"$b f1"))
    // the cascade fixture: X rides the capped history join (B-grams
    // hot at df 3 > 2), then absorbs its own excerpt Y in-batch
    val day2 = Seq(line(10, s"$b c1 c2 c3"), line(11, "c1 c2 c3"))
    for (variant <- Seq("asset", "base")) {
      val root = tmpDir(s"stream-cont-df-$variant")
      val bronzeDir = s"$root/bronze"
      new java.io.File(bronzeDir).mkdirs()
      val dfPath =
        if (variant == "asset") Some(s"$root/gramdf") else None
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$bronzeDir/day1.jsonl"),
        day1.mkString("\n").getBytes)
      Incremental.containmentStream(spark, bronzeDir, s"$root/corpus",
        s"$root/index", s"$root/ckpt", idExpr, textExpr,
        tau = 0.7, maxDf = 2, dfPath = dfPath)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$bronzeDir/day2.jsonl"),
        day2.mkString("\n").getBytes)
      Incremental.containmentStream(spark, bronzeDir, s"$root/corpus",
        s"$root/index", s"$root/ckpt", idExpr, textExpr,
        tau = 0.7, maxDf = 2, dfPath = dfPath)
      val corpus = spark.read.parquet(s"$root/corpus")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(corpus == Seq(1L, 2L, 3L, 10L),
        s"$variant cap path survivors")
      if (variant == "asset") {
        // the asset's increment leaves sum to a recount of the index
        val summed = spark.read.parquet(s"$root/gramdf")
          .groupBy("gram").agg(sum("df").as("df"))
          .select(col("gram.h1"), col("gram.h2"), col("df"))
          .collect()
          .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
        val recount = NearDup.containmentGramDf(
          spark.read.parquet(s"$root/index")
            .select("doc_id", "gram", "n_grams"))
          .select(col("gram.h1"), col("gram.h2"), col("df"))
          .collect()
          .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
        assert(summed == recount, "asset drifted from the index")
      }
    }
  }

  test("containmentStream: enabling the df asset on an EXISTING " +
    "stream seeds history counts from the persisted index (batch=-1 " +
    "leaf) — legacy grams still cap, leaves still sum to the recount") {
    import graft.operators.NearDup
    val b = (1 to 12).map(i => s"b$i").mkString(" ")
    def line(id: Long, text: String) =
      s"""{"id": $id, "text": "$text"}"""
    val idExpr = "CAST(get_json_object(raw_data, '$.id') AS LONG)"
    val textExpr = "get_json_object(raw_data, '$.text')"
    val root = tmpDir("stream-cont-df-late")
    val bronzeDir = s"$root/bronze"
    new java.io.File(bronzeDir).mkdirs()
    // day1 runs WITHOUT the asset — history exists only as the index
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day1.jsonl"),
      Seq(line(1, s"$b d1 d2 d3 d4"), line(2, s"$b e1"),
        line(3, s"$b f1")).mkString("\n").getBytes)
    Incremental.containmentStream(spark, bronzeDir, s"$root/corpus",
      s"$root/index", s"$root/ckpt", idExpr, textExpr,
      tau = 0.7, maxDf = 2, dfPath = None)
    // day2 turns the asset ON: the history-side hot set (B-grams at
    // df 3 > 2) must come from the SEEDED counts, not an empty frame
    // — X (doc 10) survives history only because its B overlap caps
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day2.jsonl"),
      Seq(line(10, s"$b c1 c2 c3"), line(11, "c1 c2 c3"))
        .mkString("\n").getBytes)
    Incremental.containmentStream(spark, bronzeDir, s"$root/corpus",
      s"$root/index", s"$root/ckpt", idExpr, textExpr,
      tau = 0.7, maxDf = 2, dfPath = Some(s"$root/gramdf"))
    val corpus = spark.read.parquet(s"$root/corpus")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(corpus == Seq(1L, 2L, 3L, 10L),
      "late-enabled asset must cap legacy history grams")
    // the seed leaf pins day1's counts, so the documented invariant
    // holds from the first dfPath batch: leaves sum to a recount
    val summed = spark.read.parquet(s"$root/gramdf")
      .groupBy("gram").agg(sum("df").as("df"))
      .select(col("gram.h1"), col("gram.h2"), col("df"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val recount = NearDup.containmentGramDf(
      spark.read.parquet(s"$root/index")
        .select("doc_id", "gram", "n_grams"))
      .select(col("gram.h1"), col("gram.h2"), col("df"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(summed == recount,
      "late-enabled asset drifted from the index")
  }

  test("containmentStream: compactLeaves between drains is invisible " +
    "— a post-compaction batch dedups against the folded history and " +
    "the df asset still sums to the recount") {
    import graft.operators.{Maintenance, NearDup}
    val b = (1 to 12).map(i => s"b$i").mkString(" ")
    def line(id: Long, text: String) =
      s"""{"id": $id, "text": "$text"}"""
    val idExpr = "CAST(get_json_object(raw_data, '$.id') AS LONG)"
    val textExpr = "get_json_object(raw_data, '$.text')"
    val root = tmpDir("stream-cont-compact")
    val bronzeDir = s"$root/bronze"
    new java.io.File(bronzeDir).mkdirs()
    def drain(): Unit =
      Incremental.containmentStream(spark, bronzeDir, s"$root/corpus",
        s"$root/index", s"$root/ckpt", idExpr, textExpr,
        tau = 0.9, dfPath = Some(s"$root/gramdf"))
    // three drained batches → three leaves per asset (+ the df seed)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day1.jsonl"),
      Seq(line(1, s"$b d1 d2 d3 d4 d5 d6")).mkString("\n").getBytes)
    drain()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day2.jsonl"),
      Seq(line(2, s"e1 e2 e3 e4 e5 e6 e7 e8 e9")).mkString("\n").getBytes)
    drain()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day3.jsonl"),
      Seq(line(3, s"f1 f2 f3 f4 f5 f6 f7 f8 f9")).mkString("\n").getBytes)
    drain()
    val folded = Maintenance.compactLeaves(spark,
      Seq(s"$root/index", s"$root/gramdf"))
    // index: leaves {0,1,2} fold 2; df asset: {-1 seed, 0, 1, 2} fold 3
    assert(folded(s"$root/index") == 2, folded.toString)
    assert(folded(s"$root/gramdf") == 3, folded.toString)
    // a POST-compaction batch must still drop excerpts of the folded
    // history (doc 1's excerpt) and keep the genuinely new doc
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day4.jsonl"),
      Seq(line(10, s"$b d1 d2 d3"),  // excerpt of folded doc 1: drops
        line(11, "g1 g2 g3 g4 g5")   // fresh: stays
      ).mkString("\n").getBytes)
    drain()
    val corpus = spark.read.parquet(s"$root/corpus")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(corpus == Seq(1L, 2L, 3L, 11L),
      "post-compaction batch must see the folded history")
    // invariant survives the fold: asset leaves sum to the recount
    val summed = spark.read.parquet(s"$root/gramdf")
      .groupBy("gram").agg(sum("df").as("df"))
      .select(col("gram.h1"), col("gram.h2"), col("df"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val recount = NearDup.containmentGramDf(
      spark.read.parquet(s"$root/index")
        .select("doc_id", "gram", "n_grams"))
      .select(col("gram.h1"), col("gram.h2"), col("df"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(summed == recount, "asset drifted across compaction")
  }

  test("neardupStream: fully-committed batch replay (commit lost) " +
    "skips the band-leaf overwrite — the same contract as containment") {
    import graft.operators.NearDup
    val root = tmpDir("stream-nd-commitlost")
    val bronzeDir = s"$root/bronze"
    new java.io.File(bronzeDir).mkdirs()
    val tA = "alpha beta gamma delta epsilon zeta eta theta"
    val tC = "one two three four five six seven eight nine"
    def line(id: Long, text: String) =
      s"""{"id": $id, "text": "$text"}"""
    val idExpr = "CAST(get_json_object(raw_data, '$.id') AS LONG)"
    val textExpr = "get_json_object(raw_data, '$.text')"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day1.jsonl"),
      Seq(line(1, tA), line(2, tC)).mkString("\n").getBytes)
    val docs = Seq((1L, tA), (2L, tC)).toDF("doc_id", "text")
    NearDup.minhashBands(docs, "doc_id", "text", 12, 4)
      .write.mode("overwrite").parquet(s"$root/bands/batch=0")
    docs.write.mode("append").parquet(s"$root/corpus")
    Incremental.neardupStream(spark, bronzeDir, s"$root/corpus",
      s"$root/bands", s"$root/ckpt", idExpr, textExpr)
    assert(spark.read.parquet(s"$root/bands").select("doc_id")
      .distinct().collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L), "replay wiped the accepted docs' band leaf")
    // the preserved band index still catches a cross-drain dup
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day2.jsonl"),
      Seq(line(3, tA)).mkString("\n").getBytes)
    Incremental.neardupStream(spark, bronzeDir, s"$root/corpus",
      s"$root/bands", s"$root/ckpt", idExpr, textExpr)
    assert(spark.read.parquet(s"$root/corpus").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
      "dup of a shipped doc must still drop via the preserved bands")
  }

  test("multimodal: image dHash through the real lossless codec") {
    import Multimodal._
    import graft.functions.ImageOps
    // known pixels round-trip the PNG codec EXACTLY (lossless + gray
    // luminance weights sum to 1000)
    val gray = Array.tabulate(72)(j => (j * 7 + 13) % 256)
    val media = Seq(MediaRecord(1L, "image", "image/png", 9, 8, 0L,
      grayPng(gray, 9, 8))).toDS()
    val px = decodeImageGray(media).collect().head
    assert(px.width == 9 && px.height == 8)
    assert(px.gray.toSeq == gray.toSeq)
    // native dHash == hand-computed gradient signs
    val hashed = decodeImageGray(media).toDF()
      .withColumn("dhash", ImageOps.dHash("gray"))
      .collect().head.getAs[Long]("dhash")
    val expected = (0 until 64).foldLeft(0L) { (acc, i) =>
      val j = (i / 8) * 9 + (i % 8)
      if (gray(j + 1) > gray(j)) acc | (1L << i) else acc
    }
    assert(hashed == expected)
    // a single-pixel perturbation moves at most the bits that read it
    val tweaked = gray.clone(); tweaked(71) = (tweaked(71) + 100) % 256
    val m2 = Seq(
      MediaRecord(1L, "image", "image/png", 9, 8, 0L, grayPng(gray, 9, 8)),
      MediaRecord(2L, "image", "image/png", 9, 8, 0L, grayPng(tweaked, 9, 8)))
      .toDS()
    val sigs = decodeImageGray(m2).toDF()
      .withColumn("dhash", ImageOps.dHash("gray"))
      .select(col("media_id").as("id"), col("dhash"))
    val hs = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(2L)) <= 1)
    // the signature-generic dedup keeps the smaller id of the twin pair
    val kept = graft.operators.NearDup.dedupBySignature(sigs, "id",
      "dhash", maxHamming = 3)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L))
  }

  test("multimodal: WHT pHash — exact coefficients, brightness/contrast invariance") {
    import Multimodal._
    import graft.functions.ImageOps
    // reference WHT + hash, independently hand-computed
    def whtRef(gray: Array[Int]): Array[Long] =
      Array.tabulate(64) { p =>
        val (u, v) = (p / 8, p % 8)
        (0 until 64).map { i =>
          val (r, c) = (i / 8, i % 8)
          val sign =
            if ((Integer.bitCount(u & r) + Integer.bitCount(v & c)) % 2 == 0)
              1L else -1L
          gray(i) * sign
        }.sum
      }
    def hashRef(cf: Array[Long]): Long = {
      val med = cf.drop(1).sorted.apply(31) // lower median of 63 AC
      (1 until 64).foldLeft(0L)((acc, p) =>
        if (cf(p) > med) acc | (1L << p) else acc)
    }
    // ≤ 119 so +40 brightness and x2 contrast both stay inside 8-bit
    val gray = Array.tabulate(64)(j => (j * 11 + 5) % 120)
    def sig(g: Array[Int]): (Seq[Long], Long) = {
      val media = Seq(MediaRecord(1L, "image", "image/png", 8, 8, 0L,
        grayPng(g, 8, 8))).toDS()
      val row = decodeImageGray(media).toDF()
        .withColumn("cf", ImageOps.whtCoefs("gray"))
        .withColumn("wht", ImageOps.whtHash("cf"))
        .withColumn("whtF", ImageOps.whtHashFromGray("gray", 8))
        .collect().head
      // the fused (accumulator-bound) form is bit-identical to the
      // chained composition it replaces in the hashing pipelines
      assert(row.getAs[Long]("whtF") == row.getAs[Long]("wht"))
      (row.getAs[scala.collection.Seq[Long]]("cf").toSeq,
        row.getAs[Long]("wht"))
    }
    val (cf, h) = sig(gray)
    assert(cf == whtRef(gray).toSeq)
    assert(cf.head == gray.map(_.toLong).sum) // DC = 64x mean
    assert(h == hashRef(whtRef(gray)))
    assert((h & 1L) == 0L) // DC bit always clear
    // brightness shift: DC moves, every AC coefficient — and the
    // hash — is untouched (the robustness dHash's local gradients
    // only get by luck)
    val brighter = gray.map(_ + 40)
    val (cfB, hB) = sig(brighter)
    assert(cfB.head == cf.head + 64L * 40)
    assert(cfB.tail == cf.tail)
    assert(hB == h)
    // contrast scaling (exact integer gain): every AC coefficient —
    // and the median — doubles, so > is preserved and the hash is
    // bit-identical
    val (cfC, hC) = sig(gray.map(_ * 2))
    assert(cfC == cf.map(_ * 2))
    assert(hC == h)
    // stride > 8: a 9-wide image whose left 8x8 crop is `gray` hashes
    // identically through whtHashFromGray(_, 9) — the t109 shape
    val wide = Array.tabulate(72) { j =>
      val (r, c) = (j / 9, j % 9)
      if (c < 8) gray(r * 8 + c) else 7
    }
    val mediaW = Seq(MediaRecord(2L, "image", "image/png", 9, 8, 0L,
      grayPng(wide, 9, 8))).toDS()
    val hW = decodeImageGray(mediaW).toDF()
      .withColumn("whtF", ImageOps.whtHashFromGray("gray", 9))
      .collect().head.getAs[Long]("whtF")
    assert(hW == h)
  }

  test("annIndexStream: O(delta) appends, drift-triggered retrain, replay no-op") {
    import graft.operators.{Ann, CommitLogTableFormat => CL}
    val root = tmpDir("stream-ann")
    val bronzeDir = s"$root/bronze"
    new java.io.File(bronzeDir).mkdirs()
    val (m, dsub, ksub) = (2, 4, 4) // 8-dim vectors, 2 subspaces
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(8)(r.nextGaussian())
    }
    // seed corpus + initial published deployment (version 1)
    val seeds = (0 until 40).map(i => (100L + i, vec(i)))
    val seedDf = seeds.toDF("vec_id", "v")
    seedDf.write.parquet(s"$root/vectors")
    Ann.ivfPqRetrain(spark, s"$root/deploy", seedDf, "vec_id", "v",
      nlist = 4, lloydIters = 2, m, dsub, ksub, pqIters = 1)
    assert(CL.versions(spark, s"$root/deploy") == Seq(1L))

    def line(id: Long, v: Seq[Double]) =
      s"""{"id": $id, "vec": [${v.mkString(", ")}]}"""
    val idExpr = "CAST(get_json_object(raw_data, '$.id') AS LONG)"
    val vecExpr =
      "from_json(get_json_object(raw_data, '$.vec'), 'array<double>')"
    def drain(ck: String): Unit =
      Incremental.annIndexStream(spark, bronzeDir, s"$root/vectors",
        s"$root/deploy", s"$root/$ck", idExpr, vecExpr, m, dsub,
        nlist = 4, lloydIters = 2, ksub, pqIters = 1, skewBound = 1.8)

    // batch 1: two new vectors — O(delta) append, assets frozen
    val fresh1 = Seq((1L, vec(901)), (2L, vec(902)))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day1.jsonl"),
      fresh1.map { case (i, v) => line(i, v) }.mkString("\n").getBytes)
    drain("ck")
    assert(CL.versions(spark, s"$root/deploy") == Seq(1L, 2L),
      "append must be ONE insert-ignore commit, no retrain")
    val (idx1, c1, b1) = Ann.ivfPqLoad(spark, s"$root/deploy").get
    assert(idx1.select("c_id").collect().map(_.getLong(0)).sorted.toSeq
      == (Seq(1L, 2L) ++ seeds.map(_._1)).sorted)
    // appended rows == encoding the delta against the frozen assets
    val manual = Ann.ivfPqIndex(fresh1.toDF("vec_id", "v"), "vec_id",
      "v", c1, "cent_id", "cv", b1, m, dsub)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Int](2))).toSet
    assert(idx1.filter(col("c_id") < 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Int](2))).toSet == manual)

    // batch 2: a mass-duplicated far block floods one cell → the
    // drift flag trips → the SAME batch retrains and swaps
    val block = (0 until 30).map(i => (200L + i, Seq.fill(8)(3.0)))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/day2.jsonl"),
      block.map { case (i, v) => line(i, v) }.mkString("\n").getBytes)
    drain("ck")
    val vs = CL.versions(spark, s"$root/deploy")
    assert(vs == Seq(1L, 2L, 3L, 4L),
      s"append commit + retrain swap expected, got $vs")
    // retrained deployment == from-scratch rebuild on the full corpus
    val all = spark.read.parquet(s"$root/vectors").select("vec_id", "v")
    val centsR = Ann.trainCentroids(all, "vec_id", "v", nlist = 4,
      iters = 2)
    val booksR = Ann.trainPq(all, "vec_id", "v", m, dsub, ksub, 1)
    val indexR = Ann.ivfPqIndex(all, "vec_id", "v", centsR, "cent_id",
      "cv", booksR, m, dsub)
    val probes = seedDf.filter(col("vec_id") < 103L)
    val (idx2, c2, b2) = Ann.ivfPqLoad(spark, s"$root/deploy").get
    def hits(i: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      Ann.ivfPqSearchIndexed(i, probes, "vec_id", "v", c, "cent_id",
        "cv", b, m, dsub, k = 5, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
    assert(hits(idx2, c2, b2) == hits(indexR, centsR, booksR),
      "streaming retrain diverged from the from-scratch rebuild")

    // replay with a FRESH checkpoint over the same files: every id is
    // already in the corpus → no commit, versions unchanged
    drain("ck2")
    assert(CL.versions(spark, s"$root/deploy") == Seq(1L, 2L, 3L, 4L))
  }

  test("cdcStream: deletes land, replay no-op, auto-optimize bounds files") {
    import spark.implicits._
    import graft.operators.{CommitLogTableFormat => CLF}
    val dir = tmpDir("cdc-stream")
    val src = s"$dir/changes"
    val target = s"$dir/table"
    val sch = Seq((0L, "", "", 0L)).toDF("k", "v", "op", "ver").schema
    def drain(ckpt: String): Unit =
      Incremental.cdcStream(
        spark.readStream.schema(sch).parquet(src), target,
        Seq("k"), "op", "ver", ckpt,
        autoOptimizeMaxFiles = Some(1))
    def state(): Set[(Long, String, Long)] =
      CLF.read(spark, target).get.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    Seq((1L, "a", "I", 1L), (2L, "b", "I", 1L), (3L, "c", "I", 1L))
      .toDF("k", "v", "op", "ver").write.mode("append").parquet(src)
    drain(s"$dir/ckpt")
    assert(state() === Set((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)))

    // second drain, same checkpoint: only the new files process —
    // a delete, an update, an insert, and a STALE delete that must lose
    Seq((2L, "-", "D", 2L), (3L, "c2", "U", 2L), (4L, "d", "I", 2L),
      (1L, "-", "D", 0L))
      .toDF("k", "v", "op", "ver").write.mode("append").parquet(src)
    drain(s"$dir/ckpt")
    val settled = state()
    assert(settled === Set((1L, "a", 1L), (3L, "c2", 2L), (4L, "d", 2L)))

    // crash-replay: a FRESH checkpoint re-reads every file as one big
    // batch; changeset-internal latest-wins + the stale-op rule make
    // the re-application a pure no-op
    drain(s"$dir/ckpt2")
    assert(state() === settled)

    // auto-optimize kept the snapshot compacted despite 3+ commits
    val files = CLF.read(spark, target).get
      .select(input_file_name()).distinct().count()
    assert(files <= 2, s"auto-optimize left $files files")
  }

  test("dedupStream: cross-batch replays collapse within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = Incremental.dedupStream(
      input.toDF.toDF("k", "v", "ts"), "ts", Seq("k"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((1L, "a", t("2026-01-01T10:00:00Z")),
        (1L, "a-dup", t("2026-01-01T10:00:01Z")),
        (2L, "b", t("2026-01-01T10:00:00Z")))
      q.processAllAvailable()
      // key 1 replayed in a LATER micro-batch: state still remembers it
      input.addData((1L, "replay", t("2026-01-01T10:30:00Z")),
        (3L, "c", t("2026-01-01T11:00:00Z")))
      q.processAllAvailable()
      val got = spark.table("dedup_out")
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted
      assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("streamStreamJoin: watermarked interval join equals the batch " +
    "join; out-of-bound and cross-key rows never pair") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val clicks = MemoryStream[(Long, String, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, String, java.sql.Timestamp)]
    val joined = Incremental.streamStreamJoin(
      clicks.toDF.toDF("k", "click", "cts"),
      buys.toDF.toDF("k", "buy", "bts"),
      Seq("k"), "cts", "bts", lateness = "1 hour", within = "10 minutes")
    val q = joined.select("k", "click", "buy")
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      clicks.addData((1L, "c1", t("2026-01-01T10:00:00Z")),
        (2L, "c2", t("2026-01-01T10:00:00Z")),
        (3L, "c3", t("2026-01-01T10:00:00Z")))
      buys.addData(
        (1L, "b-in", t("2026-01-01T10:05:00Z")), // within +10m → pairs
        (2L, "b-late", t("2026-01-01T10:20:00Z")), // outside → never
        (3L, "b-edge", t("2026-01-01T10:10:00Z"))) // closed edge → pairs
      q.processAllAvailable()
      // a second micro-batch can still pair against buffered state
      buys.addData((2L, "b-in2", t("2026-01-01T09:55:00Z"))) // -5m → pairs
      q.processAllAvailable()
      val got = spark.table("ssj_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
      assert(got.toSeq == Seq((1L, "c1", "b-in"), (2L, "c2", "b-in2"),
        (3L, "c3", "b-edge")))
      // the SAME operator evaluated as a batch join gives the same rows
      val bGot = Incremental.streamStreamJoin(
        Seq((1L, "c1", t("2026-01-01T10:00:00Z")),
          (2L, "c2", t("2026-01-01T10:00:00Z")),
          (3L, "c3", t("2026-01-01T10:00:00Z"))).toDF("k", "click", "cts"),
        Seq((1L, "b-in", t("2026-01-01T10:05:00Z")),
          (2L, "b-late", t("2026-01-01T10:20:00Z")),
          (3L, "b-edge", t("2026-01-01T10:10:00Z")),
          (2L, "b-in2", t("2026-01-01T09:55:00Z"))).toDF("k", "buy", "bts"),
        Seq("k"), "cts", "bts", "1 hour", "10 minutes")
        .select("k", "click", "buy").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
      assert(bGot.toSeq == got.toSeq)
    } finally q.stop()
  }

  test("dailyRollup: watermarked tumbling window over event-time") {
    val events = Seq(
      ("2026-01-01T10:00:00Z", 3L), ("2026-01-01T23:59:00Z", 3L),
      ("2026-01-02T00:01:00Z", 3L), ("2026-01-01T12:00:00Z", 4L))
      .toDF("ts", "branch_id")
      .withColumn("ts", to_timestamp(col("ts")))
    // batch evaluation of the same streaming plan shape
    val got = Incremental.dailyRollup(events, "ts")
      .orderBy("entry_day", "branch_id").collect()
    assert(got.map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .toSeq == Seq(("2026-01-01", 3L, 2L), ("2026-01-01", 4L, 1L),
        ("2026-01-02", 3L, 1L)))
  }

  test("multimodal: partition-local features, metadata-only pruning") {
    import Multimodal._
    val media = Seq(
      MediaRecord(1L, "image", "image/png", 64, 64, 0L,
        Array[Byte](1, 2, 3, 4)),
      MediaRecord(2L, "audio", "audio/wav", 0, 0, 1500L,
        Array[Byte](9, 8, 7))).toDS()

    val feats = extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.length == 2)
    assert(feats(0).n_bytes == 4L)
    // deterministic fake decode: integer byte sums round-robin (lane 0
    // of payload [1,2,3,4] holds exactly byte 1 — f32-exact)
    assert(feats(0).feature(0) == 1.0f)
    assert(feats(0).checksum ==
      ((((1L * 31 + 2) * 31 + 3) * 31) + 4))

    // metadata-only plan must prune the binary column at the parquet scan
    val path = tmpDir("media") + "/t"
    write(media, path)
    val stats = metadataStats(spark.read.parquet(path))
    val scanSchema = stats.queryExecution.executedPlan.toString()
    assert(scanSchema.contains("ReadSchema"))
    assert(!scanSchema.contains("data#") ||
      !scanSchema.split("ReadSchema")(1).contains("data"))
    assert(stats.count() == 2)
  }

  test("multimodal: frame sampling and resize are partition-local") {
    import Multimodal._
    val media = Seq(
      MediaRecord(1L, "video", "video/mp4", 1920, 1080, 3500L,
        Array.tabulate(16)(_.toByte)),
      MediaRecord(2L, "image", "image/png", 64, 32, 0L,
        Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)),
      MediaRecord(3L, "audio", "audio/wav", 0, 0, 900L,
        Array[Byte](9))).toDS()

    // frame-sample: 3500ms at 1000ms cadence -> frames 0,1,2 for the
    // video only; each frame carries its own tiny payload
    val frames = sampleFrames(media, everyMs = 1000L)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.media_id).distinct.toSeq == Seq(1L))
    assert(frames.map(f => (f.frame_idx, f.ts_ms)).toSeq ==
      Seq((0, 0L), (1, 1000L), (2, 2000L)))
    // deterministic fake sampler: bytes sliced at ts offset
    assert(frames(1).frame.toSeq == Seq(8.toByte, 9.toByte))
    // the one-to-many expansion happens before any shuffle
    val framePlan = sampleFrames(media, 1000L)
      .queryExecution.executedPlan.toString()
    assert(!framePlan.contains("Exchange"),
      s"frame sampling must be partition-local:\n$framePlan")

    // resize: image payload rescaled + metadata updated; video/audio
    // rows untouched
    val resized = resizeImages(media, 32, 16).collect()
      .map(r => r.media_id -> r).toMap
    assert(resized(2L).width == 32 && resized(2L).height == 16)
    assert(resized(2L).data.length == 2) // 8 bytes * (32*16)/(64*32)
    assert(resized(1L).width == 1920) // non-image passthrough
    assert(resized(3L).data.toSeq == Seq(9.toByte))
  }

  test("multimodal: REAL image decode + resize through javax.imageio") {
    import Multimodal._
    // a real 8x8 PNG: left half black, right half white
    val src = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      src.setRGB(x, y, if (x < 4) 0x000000 else 0xFFFFFF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", baos)
    val png = baos.toByteArray

    val media = Seq(
      MediaRecord(1L, "image", "image/png", 8, 8, 0L, png),
      MediaRecord(2L, "audio", "audio/wav", 0, 0, 900L,
        Array[Byte](9, 8, 7))).toDS()

    // decode: luminance histogram — half the pixels pitch-black
    // (bin 0), half pure white (bin 7); audio falls back to the fake
    val feats = extractFeatures(media, ImageDecoder).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).feature.toSeq ==
      Seq(0.5f, 0f, 0f, 0f, 0f, 0f, 0f, 0.5f))
    assert(feats(2L).feature.toSeq ==
      FakeDecoder.decode("audio", Array[Byte](9, 8, 7)).toSeq)

    // resize 8x8 -> 4x4: the output is a real PNG with exact dims and
    // the halves land where they should (corner pixels pixel-exact)
    val resized = resizeImages(media, 4, 4, ImageResizer).collect()
      .map(r => r.media_id -> r).toMap
    val out = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized(1L).data))
    assert(out.getWidth == 4 && out.getHeight == 4)
    assert((out.getRGB(0, 0) & 0xFFFFFF) == 0x000000)
    assert((out.getRGB(3, 3) & 0xFFFFFF) == 0xFFFFFF)
    assert(resized(1L).width == 4 && resized(1L).height == 4)
    assert(resized(2L).data.toSeq == Seq(9.toByte, 8.toByte, 7.toByte))

    // an undecodable image payload fails loudly, not silently
    val junk = Seq(MediaRecord(3L, "image", "image/png", 2, 2, 0L,
      Array[Byte](1, 2, 3))).toDS()
    intercept[org.apache.spark.SparkException] {
      extractFeatures(junk, ImageDecoder).collect()
    }
  }

  test("multimodal: REAL audio decode through javax.sound.sampled") {
    import Multimodal._
    // a real WAV: 16-bit signed little-endian mono PCM at 8 kHz —
    // first half a 440 Hz sine at amplitude 0.5, second half silence
    val rate = 8000f
    val nFrames = 8000
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames / 2) {
      val v = (0.5 * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    val media = Seq(
      MediaRecord(1L, "audio", "audio/wav", 0, 0, 1000L, wav),
      MediaRecord(2L, "video", "video/mp4", 4, 4, 900L,
        Array[Byte](9, 8, 7))).toDS()
    val feats = extractFeatures(media, JdkDecoder).collect()
      .map(f => f.media_id -> f).toMap

    // 8-segment RMS envelope: a constant-amplitude sine has
    // RMS = A/sqrt(2) ≈ 0.3536 in each of the first 4 segments,
    // exact zero in the silent last 4
    val env = feats(1L).feature
    assert(env.length == 8)
    for (s <- 0 until 4)
      assert(math.abs(env(s) - 0.5 / math.sqrt(2)) < 0.01,
        s"segment $s RMS ${env(s)}")
    for (s <- 4 until 8) assert(env(s) == 0f, s"segment $s not silent")
    // a video payload NEITHER container codec parses routes to the
    // declared fake (the H.264-shaped honest boundary)
    assert(feats(2L).feature.toSeq ==
      FakeDecoder.decode("video", Array[Byte](9, 8, 7)).toSeq)

    // a payload no JDK audio reader parses fails loudly
    val junk = Seq(MediaRecord(3L, "audio", "audio/mpeg", 0, 0, 0L,
      Array[Byte](1, 2, 3))).toDS()
    intercept[org.apache.spark.SparkException] {
      extractFeatures(junk, JdkDecoder).collect()
    }
  }

  test("multimodal: REAL MJPEG-in-AVI video decode, frame-exact") {
    import Multimodal._
    // codec round trip: AVI envelope in, original JPEG payloads out
    val grays = Seq(0, 1, 37, 128, 200, 255)
    val jpegs = grays.map(g => solidJpeg(g, 16, 16))
    val avi = aviMjpeg(jpegs, 16, 16)
    val split = MjpegCodec.frames(avi)
    assert(split.size == jpegs.size)
    split.zip(jpegs).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "frame bytes differ")
    }
    // raw concatenated MJPEG (no container) splits identically
    assert(MjpegCodec.frames(jpegs.flatten.toArray).size == jpegs.size)

    // sampled + decoded through the full distributed path: 6 frames
    // over 600ms at 100ms cadence = one sample per source frame, and
    // solid-gray decode is bit-exact, so mean_lum == the gray value
    val media = Seq(MediaRecord(5L, "video", "video/x-msvideo", 16, 16,
      600L, avi)).toDS()
    val stats = frameStats(sampleFramesDecoded(media, 100L))
      .collect().sortBy(_.frame_idx)
    assert(stats.map(_.frame_idx).toSeq == (0 until 6))
    assert(stats.map(_.ts_ms).toSeq == (0 until 6).map(_ * 100L))
    assert(stats.forall(s => s.width == 16 && s.height == 16))
    assert(stats.map(_.mean_lum).toSeq == grays.map(_.toDouble))

    // sub-cadence clips still yield frame 0; frameless payloads vanish
    val shortClip = Seq(MediaRecord(6L, "video", "video/x-msvideo",
      16, 16, 40L, aviMjpeg(Seq(solidJpeg(77, 16, 16)), 16, 16))).toDS()
    val s0 = frameStats(sampleFramesDecoded(shortClip, 100L)).collect()
    assert(s0.map(s => (s.frame_idx, s.mean_lum)).toSeq == Seq((0, 77.0)))
    val noFrames = Seq(MediaRecord(7L, "video", "video/x-msvideo",
      16, 16, 500L, Array[Byte](1, 2, 3, 4))).toDS()
    assert(sampleFramesDecoded(noFrames, 100L).isEmpty)
  }

  test("multimodal: MJPEG segment walk survives EXIF thumbnails") {
    import Multimodal._
    // an EXIF-style APP1 segment whose payload embeds a COMPLETE JPEG
    // (thumbnail) — its inner SOI/EOI tripped the old raw marker scan;
    // the segment walk length-skips the whole APP1
    def withThumbnail(jpeg: Array[Byte]): Array[Byte] = {
      val thumb = solidJpeg(11, 8, 8)
      val payload = "Exif  ".getBytes("US-ASCII") ++ thumb
      val len = payload.length + 2
      val app1 = Array(0xff.toByte, 0xe1.toByte,
        ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload
      // splice right after SOI
      jpeg.take(2) ++ app1 ++ jpeg.drop(2)
    }
    val grays = Seq(40, 90, 210)
    val jpegs = grays.map(g => withThumbnail(solidJpeg(g, 16, 16)))
    // each thumbnail-bearing frame stays ONE frame, bytes intact,
    // in-container and raw-concatenated alike
    val split = MjpegCodec.frames(aviMjpeg(jpegs, 16, 16))
    assert(split.size == jpegs.size)
    split.zip(jpegs).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "frame bytes differ")
    }
    assert(MjpegCodec.frames(jpegs.flatten.toArray).size == jpegs.size)
    // the spliced frames still DECODE (imageio skips unknown APP1),
    // so the downstream stat path sees the true gray values
    val media = Seq(MediaRecord(8L, "video", "video/x-msvideo", 16, 16,
      300L, aviMjpeg(jpegs, 16, 16))).toDS()
    val stats = frameStats(sampleFramesDecoded(media, 100L))
      .collect().sortBy(_.frame_idx)
    assert(stats.map(_.mean_lum).toSeq == grays.map(_.toDouble))
    // a truncated tail frame drops without losing the stream
    val torn = jpegs.flatten.toArray.dropRight(7)
    assert(MjpegCodec.frames(torn).size == jpegs.size - 1)
  }

  test("multimodal: typed audio samples + native windowed RMS/ZCR") {
    import Multimodal._
    // known 16-bit samples: k = (b - 100)·(−1)^i over bytes b —
    // alternating signs force zero crossings the window math must see
    val bytes = "abcdefgh".getBytes("US-ASCII")
    val ks = bytes.indices.map(i =>
      (bytes(i) - 100) * (if (i % 2 == 1) -1 else 1))
    val wav = wavPcm16(ks.map(k => (k * 64).toShort).toArray, 8000)
    val media = Seq(MediaRecord(9L, "audio", "audio/wav", 0, 0, 1L,
      wav)).toDS()
    val dec = decodeAudioSamples(media).collect().head
    assert(dec.sample_rate == 8000 && dec.n_samples == 8)
    assert(dec.samples.toSeq == ks.map(k => k / 512f))

    val feats = decodeAudioSamples(media).toDF()
      .select(col("media_id"), explode(
        graft.functions.AudioOps.windowFeatures("samples", 4)).as("f"))
      .select(col("f.window"), col("f.n"), col("f.rms"), col("f.zcr"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2),
        r.getInt(3))).sortBy(_._1)
    // hand-computed per window of 2: rms = sqrt((k0²+k1²)/2)/512,
    // zcr = 1 iff the in-window pair flips sign
    val expected = (0 until 4).map { w =>
      val (k0, k1) = (ks(2 * w), ks(2 * w + 1))
      (w, 2, math.sqrt((k0 * k0 + k1 * k1) / 262144.0 / 2.0),
        if (k0 * k1 < 0) 1 else 0)
    }
    assert(feats.toSeq == expected)

    // degenerate: fewer samples than windows -> empty windows are
    // (n=0, rms=0, zcr=0), not NaN
    val tiny = Seq(MediaRecord(10L, "audio", "audio/wav", 0, 0, 1L,
      wavPcm16(Array[Short](6400), 8000))).toDS()
    val tf = decodeAudioSamples(tiny).toDF()
      .select(explode(
        graft.functions.AudioOps.windowFeatures("samples", 4)).as("f"))
      .select(col("f.n"), col("f.rms"), col("f.zcr"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getInt(2)))
    assert(tf.count(_._1 == 1) == 1)
    assert(tf.filter(_._1 == 0).forall(t => t._2 == 0.0 && t._3 == 0))
    assert(!tf.exists(t => t._2.isNaN))
  }

  test("multimodal: native windowed DFT band energies (exact twiddles)") {
    import Multimodal._
    // 8 samples, 2 windows of 4: within a window (offset r), the DFT
    // at DC/fs4/Nyquist reduces to signed sums with twiddles {±1, 0}
    val bytes = "azbycxdw".getBytes("US-ASCII")
    val ks = bytes.indices.map(i =>
      (bytes(i) - 100) * (if (i % 2 == 1) -1 else 1))
    val wav = wavPcm16(ks.map(k => (k * 64).toShort).toArray, 8000)
    val media = Seq(MediaRecord(11L, "audio", "audio/wav", 0, 0, 1L,
      wav)).toDS()
    val got = decodeAudioSamples(media).toDF()
      .select(explode(
        graft.functions.AudioOps.spectralBands("samples", 2)).as("f"))
      .select(col("f.window"), col("f.n"), col("f.e_dc"), col("f.e_mid"),
        col("f.e_high"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    val expected = (0 until 2).map { w =>
      val win = ks.slice(4 * w, 4 * w + 4).map(_ / 512.0)
      val dc = win.sum
      val c4 = win(0) - win(2) // cos cycle 1,0,-1,0
      val s4 = win(1) - win(3) // sin cycle 0,1,0,-1
      val ny = win(0) - win(1) + win(2) - win(3)
      (w, 4, dc * dc / 16.0, (c4 * c4 + s4 * s4) / 16.0, ny * ny / 16.0)
    }
    // exact binary fractions: equality is ==, no tolerance
    assert(got.toSeq == expected)
    // Cauchy–Schwarz sanity: |Σ x·t|²/n² ≤ Σx²/n for any twiddle
    // vector with Σt² ≤ n — every band is bounded by the window's
    // mean power
    got.foreach { case (w, n, edc, emid, ehigh) =>
      val pw = ks.slice(4 * w, 4 * w + 4)
        .map(k => k / 512.0).map(x => x * x).sum / n
      assert(edc <= pw + 1e-12 && emid <= pw + 1e-12 &&
        ehigh <= pw + 1e-12)
    }
  }

  test("multimodal: REAL G.711 mu-law/A-law decode, JDK-transcoder parity") {
    import Multimodal._
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    // all 256 code values, both codecs
    val enc = Array.tabulate(256)(_.toByte)

    // landmark values from the G.711 tables: 0x00 is the largest
    // negative mu-law sample, 0x80 the largest positive, 0xff/0x7f
    // both decode to exact silence
    assert(AudioDecoder.ulawToLinear(0x00) == -32124)
    assert(AudioDecoder.ulawToLinear(0x80) == 32124)
    assert(AudioDecoder.ulawToLinear(0xff) == 0)
    assert(AudioDecoder.ulawToLinear(0x7f) == 0)

    for (aLaw <- Seq(false, true)) {
      val wav = wavG711(enc, 8000, aLaw)
      // the JDK parses the container and reports the companded encoding
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      assert(ais.getFormat.getEncoding ==
        (if (aLaw) AudioFormat.Encoding.ALAW else AudioFormat.Encoding.ULAW))
      ais.close()

      // our exact integer expansion == the JDK's own G.711->PCM16
      // transcoder, code for code
      val ais2 = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, false)
      val conv = AudioSystem.getAudioInputStream(pcmFmt, ais2)
      val p = conv.readAllBytes()
      conv.close()
      for (c <- 0 until 256) {
        val jdk = ((p(2 * c) & 0xff) | (p(2 * c + 1) << 8)).toShort.toInt
        val ours = if (aLaw) AudioDecoder.alawToLinear(c)
          else AudioDecoder.ulawToLinear(c)
        assert(jdk == ours, s"aLaw=$aLaw code $c: jdk=$jdk ours=$ours")
      }

      // the full decode path normalizes as k/32768, like 16-bit PCM
      val (rate, samples) = AudioDecoder.pcmSamples(wav)
      assert(rate == 8000f && samples.length == 256)
      for (c <- 0 until 256) {
        val k = if (aLaw) AudioDecoder.alawToLinear(c)
          else AudioDecoder.ulawToLinear(c)
        assert(samples(c) == (k / 32768.0).toFloat, s"sample $c")
      }
    }

    // distributed path: a mu-law payload rides decodeAudioSamples
    val media = Seq(MediaRecord(21L, "audio", "audio/basic", 0, 0, 32L,
      wavG711(enc, 8000))).toDS()
    val row = decodeAudioSamples(media).collect().head
    assert(row.sample_rate == 8000 && row.n_samples == 256)
    assert(row.samples(0) == (-32124 / 32768.0).toFloat)
  }

  test("multimodal: animated GIF codec, lossless frame round trip") {
    import Multimodal._
    // three patterned frames: GIF's palette holds all gray values, so
    // the round trip is pixel-exact (no solid-frame DC argument needed)
    val frames = (0 until 3).map { k =>
      Array.tabulate(16 * 16)(j => (k * 70 + (j % 16) * 3 + j / 16) % 256)
    }
    val gif = gifAnimated(frames, 16, 16)
    assert(new String(gif, 0, 6, "US-ASCII").startsWith("GIF8"))
    val split = GifCodec.frames(gif)
    assert(split.size == 3)
    split.zip(frames).foreach { case (png, expected) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == 16 && img.getHeight == 16)
      for (y <- 0 until 16; x <- 0 until 16)
        assert((img.getRGB(x, y) & 0xff) == expected(y * 16 + x),
          s"pixel ($x,$y)")
    }

    // torn tail: truncating mid-stream loses frames, never crashes
    val torn = GifCodec.frames(java.util.Arrays.copyOfRange(gif, 0, gif.length / 2))
    assert(torn.size < 3)
    // garbage yields nothing, matching MjpegCodec's corrupt-container path
    assert(GifCodec.frames(Array[Byte](1, 2, 3, 4)).isEmpty)

    // full distributed path: 3 frames / 300ms at 100ms cadence, solid
    // frames -> mean_lum == the gray value exactly (lossless codec)
    val solid = Seq(60, 130, 255).map(g => Array.fill(16 * 16)(g))
    val media = Seq(MediaRecord(31L, "video", "image/gif", 16, 16, 300L,
      gifAnimated(solid, 16, 16))).toDS()
    val stats = frameStats(sampleFramesDecoded(media, 100L,
      codec = GifCodec)).collect().sortBy(_.frame_idx)
    assert(stats.map(_.mean_lum).toSeq == Seq(60.0, 130.0, 255.0))

    // JdkDecoder now routes parseable video for REAL: the feature is
    // the FIRST frame's luminance histogram (solid 60 -> all mass in
    // bin 60>>5 = 1), not the byte-lane fake
    val vfeat = extractFeatures(media, JdkDecoder).collect().head.feature
    assert(vfeat(1) == 1f && vfeat.sum == 1f, vfeat.toSeq.toString)
  }

  test("multimodal: REAL IMA ADPCM predictive decode, own RIFF walk") {
    import Multimodal._
    // hand-walked from state (0,0): nibble 7 -> step 7, diff
    // 0+7+3+1 = 11, pred 11, index 8; nibble 7 again -> step 16,
    // diff 2+16+8+4 = 30, pred 41
    assert(AudioDecoder.imaDecode(Array(7, 7)).toSeq == Seq(11, 41))
    // sign nibbles subtract; clamp holds at the rails
    assert(AudioDecoder.imaDecode(Array(15, 15),
      pred0 = -32760, index0 = 0).head == -32768)

    // the JDK genuinely rejects WAV format tag 0x11 - our RIFF walk
    // is the only real decode path for it
    val nibs = Array.tabulate(40)(i => (i * 5 + 3) % 16)
    val wav = wavImaAdpcm(nibs, 8000, pred0 = 100, index0 = 5)
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
    }

    // container round trip: header predictor is the first sample,
    // then the exact predictive recursion, all as k/32768 fractions
    val (rate, samples) = AudioDecoder.pcmSamples(wav)
    assert(rate == 8000f)
    val expected = (100 +: AudioDecoder.imaDecode(nibs, 100, 5).toSeq)
      .map(k => (k / 32768.0).toFloat)
    assert(samples.toSeq == expected)

    // distributed path
    val media = Seq(MediaRecord(41L, "audio", "audio/wav", 0, 0, 5L,
      wav)).toDS()
    val row = decodeAudioSamples(media).collect().head
    assert(row.n_samples == 41 && row.samples.toSeq == expected)
  }

  test("multimodal: GIF inter-frame compositing (sub-rectangle deltas)") {
    import Multimodal._
    // delta-frame GIF the way real encoders emit them: frame 0 is the
    // full 16x16 screen (gray 100), frame 1 stores ONLY a 4x4 patch
    // (gray 200) at (8,8) -- the composited second frame must be the
    // first with the patch painted in, not the bare 4x4 raster
    val full = Array.fill(16 * 16)(100)
    val patch = Array.fill(4 * 4)(200)
    val gif = gifAnimatedAt(Seq(
      (full, 16, 16, 0, 0), (patch, 4, 4, 8, 8)))
    val fs = GifCodec.frames(gif)
    assert(fs.size == 2)
    def gray(png: Array[Byte]): Array[Array[Int]] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == 16 && img.getHeight == 16,
        s"composited frame must be full-screen, got ${img.getWidth}x${img.getHeight}")
      Array.tabulate(16, 16)((y, x) => img.getRGB(x, y) & 0xff)
    }
    val f0 = gray(fs(0))
    assert(f0.flatten.forall(_ == 100))
    val f1 = gray(fs(1))
    for (y <- 0 until 16; x <- 0 until 16) {
      val want = if (y >= 8 && y < 12 && x >= 8 && x < 12) 200 else 100
      assert(f1(y)(x) == want, s"composited pixel ($x,$y)")
    }

    // the composed distributed path sees the composited luminance:
    // frame 1 mean = (240*100 + 16*200)/256 = 106.25
    val media = Seq(MediaRecord(51L, "video", "image/gif", 16, 16, 200L,
      gif)).toDS()
    val stats = frameStats(sampleFramesDecoded(media, 100L,
      codec = GifCodec)).collect().sortBy(_.frame_idx)
    assert(stats.map(_.mean_lum).toSeq == Seq(100.0, 106.25))
  }

  test("multimodal: audio fingerprint bits + signature dedup collapse") {
    import Multimodal._
    // 130 samples = 65 windows of exactly 2; window w holds value
    // h(w)/512 twice, so energy(w) = 2 h(w)^2 / 2^18 and bit w of the
    // fingerprint is [h(w+1)^2 > h(w)^2] -- hand-computable
    def clip(hs: Int => Int): Array[Short] = {
      val out = new Array[Short](130)
      for (w <- 0 until 65) {
        out(2 * w) = (hs(w) * 64).toShort
        out(2 * w + 1) = (hs(w) * 64).toShort
      }
      out
    }
    val hA: Int => Int = w => if (w % 2 == 0) 10 else 20 // alternating
    val hB: Int => Int = w => w // monotone rising magnitude
    val expectedA = (0 until 64).map(w =>
      if (hA(w + 1) * hA(w + 1) > hA(w) * hA(w)) 1L << w else 0L).sum
    val expectedB = (0 until 64).map(_ => 1L).zipWithIndex
      .map { case (_, w) => 1L << w }.sum // every gradient rises
    val media = Seq(
      MediaRecord(1L, "audio", "audio/wav", 0, 0, 16L,
        wavPcm16(clip(hA), 8000)),
      MediaRecord(2L, "audio", "audio/wav", 0, 0, 16L,
        wavPcm16(clip(hB), 8000)),
      // twin of 1 -> identical fingerprint, must collapse in dedup
      MediaRecord(3L, "audio", "audio/wav", 0, 0, 16L,
        wavPcm16(clip(hA), 8000))).toDS()
    val sigs = decodeAudioSamples(media).toDF()
      .withColumn("fp", graft.functions.AudioOps.audioFingerprint("samples"))
      .select(col("media_id").as("doc_id"), col("fp"))
    val got = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == expectedA, s"fingerprint A: ${got(1L)}")
    assert(got(2L) == expectedB, s"fingerprint B: ${got(2L)}")
    assert(got(3L) == got(1L))

    // shared dedup machinery: the twin collapses, the distinct
    // envelope survives (hamming(A, B) is far above the radius)
    val kept = graft.operators.NearDup
      .dedupBySignature(sigs, "doc_id", "fp", maxHamming = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("multimodal: Y4M codec, uncompressed frame round trip") {
    import Multimodal._
    // patterned Y planes: raw YUV is uncompressed, so the round trip
    // is pixel-exact by construction; C420 chroma (neutral 128) must
    // be skipped by the size formula or frame boundaries shear
    val frames = (0 until 3).map { k =>
      Array.tabulate(16 * 16)(j => (k * 70 + (j % 16) * 3 + j / 16) % 256)
    }
    val y4m = y4mVideo(frames, 16, 16)
    assert(new String(y4m, 0, 9, "US-ASCII") == "YUV4MPEG2")
    val split = Y4mCodec.frames(y4m)
    assert(split.size == 3)
    split.zip(frames).foreach { case (png, expected) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == 16 && img.getHeight == 16)
      for (y <- 0 until 16; x <- 0 until 16)
        assert((img.getRGB(x, y) & 0xff) == expected(y * 16 + x),
          s"pixel ($x,$y)")
    }

    // mono colorspace: no chroma bytes at all
    val mono = Y4mCodec.frames(y4mVideo(frames, 16, 16, "mono"))
    assert(mono.size == 3 &&
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        mono(1))).getRGB(3, 2) == (0xff000000 | 0x515151)) // (70+3·3+2)=81

    // torn tail: a truncated frame body ends the stream THERE (no
    // resync marker in raw YUV) - earlier frames intact, tail lost
    val torn = Y4mCodec.frames(
      java.util.Arrays.copyOfRange(y4m, 0, y4m.length - 10))
    assert(torn.size == 2)
    // garbage / wrong magic / malformed header yield nothing
    assert(Y4mCodec.frames(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Y4mCodec.frames("YUV4MPEG2 Wx Hy\nFRAME\n".getBytes).isEmpty)
    assert(Y4mCodec.frames(
      "JUNK W16 H16\nFRAME\n".getBytes ++ Array.fill(384)(1.toByte))
      .isEmpty)

    // full distributed path: solid frames -> mean_lum == gray exactly
    val solid = Seq(60, 130, 255).map(g => Array.fill(16 * 16)(g))
    val media = Seq(MediaRecord(41L, "video", "video/x-y4m", 16, 16, 300L,
      y4mVideo(solid, 16, 16))).toDS()
    val stats = frameStats(sampleFramesDecoded(media, 100L,
      codec = Y4mCodec)).collect().sortBy(_.frame_idx)
    assert(stats.map(_.mean_lum).toSeq == Seq(60.0, 130.0, 255.0))
  }
  test("multimodal: RIFF LIST/INFO tags — exact offsets, decode " +
    "transparency, totality on torn payloads") {
    import Multimodal._
    val samples = Array.tabulate[Short](16)(i => (i * 100 - 800).toShort)
    val wav = wavPcm16(samples, 8000)
    assert(riffInfoTags(wav).isEmpty, "no INFO list in the plain writer")
    val tagged = withRiffInfo(wav,
      Seq("INAM" -> "A Name", "IART" -> "Artist", "ICMT" -> "c=1"))
    val tags = riffInfoTags(tagged)
    assert(tags.map(t => (t.tag, t.value)) == Seq(
      ("INAM", "A Name"), ("IART", "Artist"), ("ICMT", "c=1")))
    // offsets follow the append arithmetic the t132 oracle rederives:
    // base wav 44 + 32 data, LIST header 8 + 'INFO' -> first sub at 88
    assert(tags(0).offset == wav.length + 12)
    val p1 = "A Name".length + 1 + (("A Name".length + 1) % 2)
    assert(tags(1).offset == wav.length + 12 + 8 + p1)
    // decoders that ignore unknown chunks read the audio unchanged
    val (r0, d0) = AudioDecoder.pcmSamples(wav)
    val (r1, d1) = AudioDecoder.pcmSamples(tagged)
    assert(r0 == r1 && d0.toSeq == d1.toSeq,
      "trailing INFO list must be decode-transparent")
    // the fixed RIFF size covers the appended list
    def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    assert(le32(tagged, 4) == tagged.length - 8)
    // totality: every truncation point parses without throwing
    for (cut <- 0 to tagged.length)
      riffInfoTags(java.util.Arrays.copyOfRange(tagged, 0, cut))
    assert(riffInfoTags("not riff".getBytes).isEmpty)
  }
}
