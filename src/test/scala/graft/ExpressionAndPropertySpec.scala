package graft

import graft.functions.Keys
import graft.operators.MergeOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Native Md5Key15 expression parity + ScalaCheck idempotency
  * properties (SURVEY.md §5.2 property tests). Raw ScalaCheck with
  * fixed seeds (no scalatestplus bridge in the offline dep set) —
  * deterministic yet property-shaped.
  */
class ExpressionAndPropertySpec extends SparkSpec {
  import spark.implicits._

  test("native expression == composed md5Key15, incl. Python constants") {
    val keys = Seq(
      "2024-03-05T07:45:00Z|101|||3|Turnstile-01|Entry",
      "2023-01-01T00:00:00Z||5||1||Exit",
      "||||||", "", "unicode-ü-日本語")
    val df = keys.toDF("k").select(
      Keys.md5Key15(col("k")).as("composed"),
      Keys.md5Key15Native(col("k")).as("native"))
    val rows = df.collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    val byKey = keys.zip(rows.map(_.getLong(1))).toMap
    assert(byKey("2024-03-05T07:45:00Z|101|||3|Turnstile-01|Entry")
      == 666922933622125L)
    assert(byKey("2023-01-01T00:00:00Z||5||1||Exit") == 930635880053884L)
    assert(byKey("||||||") == 214332784082451L)
  }

  test("native expression null handling and SQL registration") {
    val df = Seq(Some("abc"), None).toDF("k")
      .select(Keys.md5Key15Native(col("k")).as("v"))
    val got = df.collect().map(r => Option(r.get(0)))
    assert(got(0).isDefined && got(1).isEmpty)

    Keys.registerSqlFunctions(spark)
    Seq("abc").toDF("k").createOrReplaceTempView("kv")
    val sql = spark.sql("SELECT md5_key15(k) AS v FROM kv").collect()(0)
    assert(sql.getLong(0) == got(0).get.asInstanceOf[Long])
  }

  test("native MinhashSig == composed md5+conv+fold, slot by slot") {
    import graft.functions.TextOps
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight nine",
      "unicode ü 日本語 tokens with wide chars mixed in here",
      "a b", // <3 tokens: empty shingle array -> all MaxValue slots
      "x y z") // exactly 3 tokens: one shingle
    val k = 12
    val sh = texts.toDF("text")
      .withColumn("tk", TextOps.tokens(col("text")))
      .select(col("text"), TextOps.shingles3Raw(col("tk")).as("shraw"))
    val composed = sh.withColumn("hs",
      transform(col("shraw"), x => TextOps.tokenHash32(x)))
      .withColumn("mins", aggregate(col("hs"),
        array_repeat(lit(Long.MaxValue), k),
        (acc, h) => array((0 until k).map(p =>
          least(get(acc, lit(p)),
            (lit(TextOps.minhashA(p)) * h + lit(TextOps.minhashB(p)))
              % lit(TextOps.MinhashP))): _*)))
    val native = sh.withColumn("mins",
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.expressions.MinhashSig(
          org.apache.spark.sql.GraftColumnBridge.expression(col("shraw")),
          k)))
    val c = composed.select("text", "mins").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val n = native.select("text", "mins").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    for (t <- texts) assert(n(t) == c(t), s"mismatch for '$t'")
    assert(n("a b").forall(_ == Long.MaxValue))
  }

  test("native Ngrams == composed slices/zip_with, incl. NULL input, " +
    "short docs, empty tokens, and the char-trigram sep='' form") {
    import org.apache.spark.sql.GraftColumnBridge
    def native(c: org.apache.spark.sql.Column, n: Int, sep: String) =
      GraftColumnBridge.column(graft.expressions.Ngrams(
        GraftColumnBridge.expression(c), n, sep))
    def composed(toks: org.apache.spark.sql.Column, n: Int,
        sep: String) = {
      val m = size(toks) - (n - 1)
      val slices = (0 until n).map(i => slice(toks, lit(i + 1), m))
      when(m >= 1, slices.reduce((acc, s) => zip_with(acc, s,
        (x, y) => if (sep.isEmpty) concat(x, y)
          else concat(x, lit(sep), y))))
        .otherwise(array().cast("array<string>"))
    }
    val texts = Seq(Some("alpha beta gamma delta epsilon"),
      Some("a  b c"), // double space → empty token inside grams
      Some("ab"), Some(""), Option.empty[String],
      Some("unicode ü 日本語 x y"))
    val df = texts.toDF("text")
      .withColumn("tk", split(col("text"), " "))
      .withColumn("ch", split(lower(col("text")), ""))
    for ((colName, n, sep) <- Seq(("tk", 2, " "), ("tk", 3, " "),
        ("tk", 5, " "), ("ch", 3, ""))) {
      val rows = df.select(
        native(col(colName), n, sep).as("nat"),
        composed(col(colName), n, sep).as("cmp")).collect()
      rows.zip(texts).foreach { case (r, t) =>
        assert(!r.isNullAt(0), s"native must never be NULL ($t)")
        assert(r.getSeq[String](0) == (if (r.isNullAt(1)) Seq.empty
          else r.getSeq[String](1)),
          s"$colName n=$n sep='$sep' text=$t")
      }
    }
    // null TOKEN inside the array nulls exactly its spanning grams
    val withNull = spark.sql(
      "SELECT array('a', cast(null as string), 'b', 'c') AS tk")
    val got = withNull.select(native(col("tk"), 2, " ").as("g"))
      .head().getSeq[String](0)
    assert(got == Seq(null, null, "b c"))
  }

  test("property: D1 gold equals latest-loaded version per (scope, id)") {
    import graft.gold.Pipedrive
    val versionGen = Gen.listOfN(40, for {
      scope <- Gen.oneOf("comercial", "expansao")
      id <- Gen.choose(1L, 6L)
      loadedAt <- Gen.choose(1L, 500L)
      title <- Gen.alphaStr.map(_.take(5))
    } yield (scope, id, loadedAt, title))

    for (seed <- 1 to 5) {
      val rows: List[(String, Long, Long, String)] =
        versionGen(Gen.Parameters.default, Seed(seed.toLong)).getOrElse(Nil)
      locally {
        val silver = rows.zipWithIndex.map { case ((scope, id, at, t), i) =>
          (s"""{"id": $id, "title": "$t"}""", scope,
            f"blob-$at%05d", i, "r1",
            new java.sql.Timestamp(at * 1000))
        }.toDF("raw_data", "scope", "source_blob_path", "source_line_no",
          "run_id", "loaded_at")
        val got = Pipedrive.dedupLatest(silver)
          .select(col("scope"), col("id"),
            get_json_object(col("raw_data"), "$.title").as("title"))
          .collect().map(r => ((r.getString(0), r.getLong(1)),
            r.getString(2))).toMap
        // expected: per key, the version with max (loaded_at, blob, line)
        val expect = rows.zipWithIndex
          .groupBy { case ((s, id, _, _), _) => (s, id) }
          .map { case (k, vs) =>
            k -> vs.maxBy { case ((_, _, at, _), i) =>
              (at, f"blob-$at%05d", i)
            }._1._4
          }
        assert(got == expect, s"seed=$seed")
      }
    }
  }

  test("property: keepLatest-upsert is idempotent and last-write-wins") {
    val batchGen = Gen.listOfN(30, for {
      id <- Gen.choose(1L, 8L)
      version <- Gen.choose(1L, 1000L)
      payload <- Gen.alphaStr.map(_.take(6))
    } yield (id, version, payload))

    for (seed <- 1 to 8) {
      val rows: List[(Long, Long, String)] =
        batchGen(Gen.Parameters.default, Seed(seed.toLong)).getOrElse(Nil)
      locally {
        val path = tmpDir("prop") + "/t"
        val df = rows.toDF("id", "version", "payload")
          // tie-break so equal versions pick deterministically
          .withColumn("version",
            concat(lpad(col("version").cast("string"), 6, "0"),
              col("payload")))
        MergeOps.upsert(spark, df, path, Seq("id"), "version")
        val once = spark.read.parquet(path).orderBy("id")
          .collect().map(_.toString).toSeq
        // replaying the identical batch changes nothing
        MergeOps.upsert(spark, df, path, Seq("id"), "version")
        val twice = spark.read.parquet(path).orderBy("id")
          .collect().map(_.toString).toSeq
        assert(once == twice)
        // result = exactly max-version row per id
        val expect = rows.map { case (id, v, p) =>
          (id, f"$v%06d$p")
        }.groupBy(_._1).map { case (id, vs) => (id, vs.map(_._2).max) }
        val got = spark.read.parquet(path)
          .select("id", "version").collect()
          .map(r => (r.getLong(0), r.getString(1))).toMap
        assert(got == expect)
      }
    }
  }
}
