package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._

/** Skew-salting correctness + bucketed co-located join (shuffle-free,
  * asserted on the physical plan). */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin: identical results to plain join under heavy skew") {
    // 10k rows of hot key 1, a few of others
    val fact = ((1 to 10000).map(i => (1L, i.toLong)) ++
      Seq((2L, -1L), (3L, -2L))).toDF("k", "v")
    val dim = Seq((1L, "hot"), (2L, "warm"), (3L, "cold"), (4L, "unused"))
      .toDF("k", "label")
    val plain = fact.join(dim, Seq("k")).groupBy("k", "label")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(_.toString).sorted.toSeq
    val salted = Scale.saltedJoin(fact, dim, Seq("k"), buckets = 8)
      .groupBy("k", "label")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("saltedSumCount equals direct aggregate") {
    val df = ((1 to 5000).map(_ => ("hot", 2.0)) ++
      Seq(("cold", 1.5))).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val salted = Scale.saltedSumCount(df, Seq("k"), "v", 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(salted == direct)
  }

  test("boundedRangeJoin enumerates exactly the naive theta-join pairs") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 500).map(i =>
      (i.toLong % 5, i.toLong, rng.nextInt(100000).toLong))
    val e = rows.toDF("k", "id", "us")
    val a = e.select(col("k"), col("id").as("i1"), col("us").as("u1"))
    val b = e.select(col("k"), col("id").as("i2"), col("us").as("u2"))
    val tol = 7000L
    val naive = a.join(b, Seq("k"))
      .filter(col("u2") >= col("u1") && col("u2") - col("u1") <= tol)
      .select("k", "i1", "i2").collect().map(_.toString).sorted.toSeq
    val bucketed = Scale.boundedRangeJoin(a, b, Seq("k"), "u1", "u2", tol)
      .select("k", "i1", "i2").collect().map(_.toString).sorted.toSeq
    assert(bucketed == naive && naive.nonEmpty)
  }

  test("asOfJoin: latest right value at-or-before each left row") {
    val left = Seq((1L, 100L, "e1"), (1L, 250L, "e2"), (1L, 50L, "e0"),
      (2L, 500L, "ex")).toDF("k", "lts", "name")
    val right = Seq((1L, 100L, "p100", 1L), (1L, 200L, "p200", 2L),
      (1L, 200L, "p200b", 3L), (3L, 1L, "other", 4L))
      .toDF("k", "rts", "price", "rid")
    val got = Scale.asOfJoin(left, right, Seq("k"), "lts", "rts",
      "price", "rid")
      .select("name", "price").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(got("e1") == Some("p100")) // inclusive <=
    assert(got("e2") == Some("p200b")) // latest, tie by rid
    assert(got("e0") == None) // nothing before
    assert(got("ex") == None) // key without right rows
  }

  test("asOfJoin: a null-valued right row wins its match (ASOF parity)") {
    val left = Seq((1L, 300L, "e")).toDF("k", "lts", "name")
    val right = Seq((1L, 100L, Some("p100"), 1L),
      (1L, 200L, None: Option[String], 2L)) // latest right value IS null
      .toDF("k", "rts", "price", "rid")
    val row = Scale.asOfJoin(left, right, Seq("k"), "lts", "rts",
      "price", "rid").select("price").collect()(0)
    // DuckDB ASOF would match the rts=200 row and return its NULL —
    // falling back to p100 would silently resurrect a stale value
    assert(row.isNullAt(0))
  }

  test("dedupLatestEventTime: stale late arrival does not win") {
    import org.apache.spark.sql.functions.to_timestamp
    def v(line: Int, loaded: String, updated: String, title: String) =
      (s"""{"id": 1, "title": "$title", "update_time": "$updated"}""",
        "comercial", "blob", line, "r", loaded)
    val silver = Seq(
      v(1, "2026-01-01T00:00:00Z", "2026-01-01T00:00:00Z", "v1"),
      v(2, "2026-01-02T00:00:00Z", "2026-01-02T00:00:00Z", "v2-current"),
      // loaded LAST but update_time oldest (replayed stale blob)
      v(3, "2026-01-03T00:00:00Z", "2025-12-01T00:00:00Z", "v0-stale"))
      .toDF("raw_data", "scope", "source_blob_path", "source_line_no",
        "run_id", "loaded_at")
      .withColumn("loaded_at", to_timestamp(col("loaded_at")))
    // load-time policy (reference parity): stale wins
    assert(graft.gold.Pipedrive.dedupLatest(silver)
      .select(get_json_object(col("raw_data"), "$.title")).collect()(0)
      .getString(0) == "v0-stale")
    // event-time policy: newest update_time wins
    assert(graft.gold.Pipedrive.dedupLatestEventTime(silver)
      .select(get_json_object(col("raw_data"), "$.title")).collect()(0)
      .getString(0) == "v2-current")
  }

  test("NearDup: hot-bucket guard bounds a degenerate corpus") {
    import graft.operators.NearDup
    // 10k copies of one document + two distinct docs: every band
    // bucket of the duplicated text holds 10k entries — clique
    // expansion would be ~50M pairs / a 10k-wide collect_list array
    val docs = ((1 to 10000).map(i =>
      (i.toLong, "the same exact duplicated document text body here")) ++
      Seq((20001L, "a completely different first probe text one two three"),
        (20002L, "yet another unrelated second probe text four five six")))
      .toDF("doc_id", "text")
    val bands = NearDup.minhashBands(docs, "doc_id", "text", 12, 4)
    // diagnostic surfaces the pathology
    val over = NearDup.oversizedBuckets(bands, maxBucket = 64).collect()
    assert(over.nonEmpty && over.forall(_.getAs[Long]("bucket_size") == 10000L))
    // guarded expansion: hub-star, n-1 pairs per bucket -> 9999 distinct
    val pairs = NearDup.candidatePairs(bands, "doc_id", maxBucket = 64)
    assert(pairs.count() == 9999)
    // end-to-end dedup keeps exactly the hub + the two distinct docs
    val survivors = NearDup.dedupByMinhash(docs, "doc_id", "text",
      threshold = 0.9, maxBucket = 64)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(survivors.toSeq == Seq(1L, 20001L, 20002L))
  }

  test("scaled corpus (10x sf0.01 + mass-dup block): guard holds, " +
    "dedup completes, pathology collapses to one survivor") {
    import graft.operators.NearDup
    import graft.tools.ScaleUp
    // the generated sf1-class shape at spec scale: every doc gains 9
    // near-dup replicas (one marker token appended), plus one doc
    // duplicated 300x verbatim in a far id range
    val base = Tables(spark, "/root/testdata/sf0.01", "documents")
    val docs = ScaleUp.scaleDocs(base, factor = 10, pathoDups = 300)
      .select("doc_id", "text")
    val n = docs.count()
    assert(n == base.count() * 10 + 300)

    val bands = NearDup.minhashBands(docs, "doc_id", "text", 12, 4)
    // the pathological block must SURFACE in the diagnostic...
    val over = NearDup.oversizedBuckets(bands, maxBucket = 64).collect()
    assert(over.nonEmpty)
    assert(over.forall(_.getAs[Long]("bucket_size") >= 300L))
    // ...and the guarded dedup must complete with the whole block
    // removed: the verbatim ORIGINAL (smallest id in the shared
    // bucket) is the hub, every patho copy verifies J=1 against it
    val survivors = NearDup.dedupByMinhash(docs, "doc_id", "text",
      threshold = 0.8, maxBucket = 64)
    assert(survivors.filter(col("doc_id") >= ScaleUp.PathoBase).count() == 0)
    val minId = base.agg(min("doc_id")).collect()(0).getLong(0)
    assert(survivors.filter(col("doc_id") === minId).count() == 1)
    // replicas of long docs dedup against their originals; nothing is
    // ever added
    assert(survivors.count() < n)
  }

  test("bucketed join runs with zero shuffle exchanges") {
    val a = (1L to 2000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 2000L).map(i => (i, s"b$i")).toDF("k", "vb")
    Scale.writeBucketed(a, "bkt_a", "k", 8)
    Scale.writeBucketed(b, "bkt_b", "k", 8)
    // force SMJ (no broadcast) so the exchange-free property is visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "bkt_a", "bkt_b", "k")
      assert(joined.count() == 2000)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan was:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
