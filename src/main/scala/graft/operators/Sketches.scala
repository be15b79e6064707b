package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate analytics — the sub-linear-memory answers
  * a 100-TB profiling pass needs where exact answers would shuffle the
  * corpus: distinct cardinalities (HyperLogLog++), quantiles
  * (Greenwald-Khanna), and frequent items. All three are Spark
  * built-ins (map-side partial sketches merge associatively — one
  * narrow shuffle of fixed-size sketch state per group, never the
  * values), surfaced here with the error-contract documented and
  * spec-tested instead of assumed.
  *
  * No DuckDB oracle: sketch state is engine-specific by nature (the
  * gate queries use exact counts; these operators exist for the scales
  * where exact is the wrong plan). Accuracy bounds are pinned in
  * SketchesSpec against exact answers on data large enough for the
  * estimate to be non-trivial.
  */
object Sketches {

  /** Per-group approximate distinct + total counts:
    * (groupCols..., n_rows, approx_distinct). `rsd` is HLL++ relative
    * standard deviation (default 5%; memory ∝ 1/rsd²). */
  def distinctProfile(df: DataFrame, groupCols: Seq[String],
      col_ : String, rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        approx_count_distinct(col(col_), rsd).as("approx_distinct"))

  /** Per-group approximate quantiles of a numeric column, one row per
    * group: (groupCols..., q_<pct>...). `accuracy` is the
    * Greenwald-Khanna inverse-epsilon (default 1000 → ε = 0.1%). */
  def quantileProfile(df: DataFrame, groupCols: Seq[String],
      col_ : String, percentiles: Seq[Double],
      accuracy: Int = 1000): DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 0.0 && p <= 1.0))
    require(percentiles.map(p => (p * 100).round).distinct.size ==
      percentiles.size,
      "percentiles collide after rounding to whole-percent column names")
    val pArr = array(percentiles.map(lit): _*)
    val q = percentile_approx(col(col_), pArr, lit(accuracy)).as("__q")
    val grouped = df.groupBy(groupCols.map(col): _*).agg(q)
    percentiles.zipWithIndex.foldLeft(grouped) { case (acc, (p, i)) =>
      acc.withColumn(s"q_${(p * 100).round}", element_at(col("__q"), i + 1))
    }.drop("__q")
  }

  /** Approximate membership prune: build a Bloom filter over
    * `keyCol` of `small` (expectedItems/fpp sized) and return rows of
    * `large` whose `keyCol` might be in it — the classic pre-join
    * reducer when the join side is too big to broadcast but its KEY
    * SET fits a filter: false positives only (never drops a match),
    * so a later exact join stays correct while shuffling only the
    * surviving fraction. The probe is Spark's own codegen'd
    * `BloomFilterMightContain` predicate (what runtime row-level
    * filtering injects) over the serialized filter literal — NOT a
    * Scala UDF, so the scan stage stays in whole-stage codegen. */
  def bloomPrune(large: DataFrame, small: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    // BloomFilterMightContain typechecks its value to LongType only
    // (and evals via mightContainLong), so EVERY key reaches the
    // filter as a long: integrals cast, strings hashed with xxhash64
    // on BOTH the build and probe sides (same hash → same bit
    // pattern; the fpp contract absorbs hash collisions as ordinary
    // false positives, never false negatives). Anything else must
    // fail loudly — a blanket cast("long") would turn string keys
    // into NULLs and silently drop EVERY row.
    val integral: Set[DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    val key = (large.schema(keyCol).dataType,
        small.schema(keyCol).dataType) match {
      case (StringType, StringType) => xxhash64(col(keyCol))
      case (a, b) if integral(a) && integral(b) =>
        col(keyCol).cast("long")
      case (a, b) => throw new IllegalArgumentException(
        s"bloomPrune: key '$keyCol' must be integral or string on both " +
          s"sides, got $a / $b")
    }
    val bf = small.stat.bloomFilter(key, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val probe = org.apache.spark.sql.GraftColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal
          .create(bos.toByteArray,
            org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.GraftColumnBridge.expression(key)))
    large.filter(probe)
  }

  /** Salted row-hash for Count-Min row `j`: the same externally
    * replayable md5 idiom as [[Sample]]'s buckets (the t88 oracle
    * rederives every bucket in DuckDB), 32 bits so the value is
    * non-negative before the modulo. NULL keys hash via a NUL-byte
    * sentinel — without it the null rows would land in a dead
    * bucket=NULL cell no probe can equi-join, and the estimate for a
    * null key would come back 0 under a positive true count, breaking
    * the upper-bound contract. (A real key equal to the sentinel
    * merely aliases — inflation is within the CM contract, undercount
    * is not.) */
  private def cmHash(key: Column, j: Int): Column =
    conv(substring(md5(concat(lit(s"cm$j"), lit("|"),
      coalesce(key.cast("string"), lit("\u0000")))), 1, 8), 16, 10)
      .cast("long")

  /** Count-Min sketch of `keyCol` frequencies: `depth` independent
    * salted-hash rows × `width` buckets, returned as its non-zero
    * cells `(j, bucket, cnt)` — at most depth·width rows regardless
    * of corpus size. The d× row expansion happens map-side and
    * aggregates partially before the one narrow shuffle of
    * fixed-cardinality cells, so a 100 TB pass moves sketch state,
    * never values. Cells are plain counts, so two sketches over
    * disjoint data MERGE by summing matching cells (spec-asserted) —
    * the property that lets per-day sketches roll up into a month
    * without touching the raw corpus again. */
  /** Per-group DISTINCT-COUNT ASSET: Datasketches HLL state as a
    * binary column — the persistable/incremental form of
    * [[distinctProfile]]. Where `approx_count_distinct` answers once
    * and throws its state away, this keeps the sketch, so "unique
    * keys per source, updated daily" becomes: sketch today's
    * partition, [[distinctSketchMerge]] with the stored asset, store
    * back — O(today) work, the month's raw corpus never re-scanned.
    * HLL register state is a per-bucket max, so merge is exact: the
    * merged sketch is bit-for-bit the sketch of the union, whatever
    * the batch/partition split (spec-asserted). `lgK` = log2 of
    * register count (default 12 → ~1.6% rse, 4 KB/group). */
  def distinctSketch(df: DataFrame, groupCols: Seq[String],
      col_ : String, lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(col_), lit(lgK)).as("hll"),
        count(lit(1)).as("n_rows"))

  /** Roll sketches up — across days, partitions, or any asset split:
    * groups re-aggregate with an HLL union (`n_rows` sums). Groups
    * present in only some inputs survive with their own state. */
  def distinctSketchMerge(sketches: DataFrame,
      groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("hll")).as("hll"),
        sum(col("n_rows")).as("n_rows"))

  /** Read an asset: (groupCols..., n_rows, approx_distinct). */
  def distinctSketchEstimate(sketches: DataFrame,
      groupCols: Seq[String]): DataFrame =
    sketches.select(groupCols.map(col) :+ col("n_rows") :+
      hll_sketch_estimate(col("hll")).as("approx_distinct"): _*)

  /** xxhash64 output mapped to a uniform fraction in [0, 1): the
    * signed long is re-centred to its unsigned position, so hash
    * ORDER (signed ascending) equals position order and the k-th
    * smallest hash IS the k-th smallest fraction. */
  private def hashFrac(h: Column): Column =
    h.cast("double") / lit(1.8446744073709552e19) + lit(0.5)

  private val KmvCol = "kmv"

  /** Per-group KMV ("k minimum values" / theta) DISTINCT-VALUE
    * sketch: the k smallest distinct xxhash64 values of `col_`, kept
    * as a sorted array — the sketch family that, unlike HLL
    * ([[distinctSketch]]), supports set INTERSECTION: retained
    * hashes are a uniform sample of the value universe below a known
    * threshold, so two sketches can be compared value-by-value.
    * Estimator: with θ = frac(kth smallest), E[distinct] = (k−1)/θ
    * (RSE ≈ 1/√(k−2)); a sketch with fewer than k values has seen
    * EVERY distinct hash and estimates exactly.
    *
    * Distribution shape: ONE corpus scan reduces to
    * (group, partition, hash, multiplicity) rows — a spillable hash
    * aggregate with map-side partial combine, so what crosses the
    * exchanges is deduplicated hash rows, never row payloads — then a
    * per-(group, partition) rank window keeps the k minima BEFORE any
    * array materializes: every aggregation buffer from here on holds
    * ≤ k elements. (The first version collect_set the whole distinct
    * set into one array buffer per group before slicing — an
    * unbounded, unspillable allocation at corpus scale. Two exchanges
    * of hash rows remain: the dedup-count keys on (…, hash), the
    * window on (…, partition) — a narrower clustering.) NULL values
    * hash to a NULL slot that never enters the sketch and never
    * counts, matching COUNT(DISTINCT col) semantics — xxhash64 would
    * otherwise hash a NULL to the seed constant and permanently
    * inflate every estimate by one — but a group whose values are ALL
    * NULL still emits its row (empty sketch, n_rows 0), like GROUP BY
    * keeps the group. `n_rows` (non-null rows, multiplicity included)
    * rides along so assets stay self-describing. */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], col_ : String,
      k: Int = 256): DataFrame = {
    require(k >= 16, s"kmv k=$k too small for the (k-1)/theta estimator")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val keyed = df.select(g :+
      when(col(col_).isNotNull, xxhash64(col(col_))).as("__h") :+
      spark_partition_id().as("__pid"): _*)
    val dd = keyed
      .groupBy(g ++ Seq(col("__pid"), col("__h")): _*)
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(g :+ col("__pid"): _*)
    val marked = dd
      .withColumn("__nr", sum(when(col("__h").isNotNull, col("__cnt"))
        .otherwise(0L)).over(w))
      .withColumn("__rn",
        row_number().over(w.orderBy(col("__h").asc_nulls_last)))
    val partials = marked
      .groupBy(g :+ col("__pid"): _*)
      // collect_list skips NULLs: the NULL-value slot and the beyond-k
      // tail both vanish here, while an all-NULL (group, pid) still
      // aggregates to an EMPTY partial instead of disappearing
      .agg(array_sort(collect_list(
        when(col("__rn") <= k, col("__h")))).as(KmvCol),
        coalesce(max(col("__nr")), lit(0L)).as("n_rows"))
    kmvMerge(partials.drop("__pid"), groupCols, k)
  }

  /** Union-merge KMV assets — across days, partitions, any split: the
    * k smallest of the combined retained hashes are exactly the k
    * smallest of the unioned inputs (every dropped hash was already
    * above a surviving k-th minimum), so merge(sketch(A), sketch(B))
    * == sketch(A ∪ B) bit-for-bit, spec-asserted. State folded per
    * group is ≤ k·inputs hashes. */
  def kmvMerge(sketches: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(slice(array_sort(array_distinct(
        flatten(collect_list(col(KmvCol))))), 1, k).as(KmvCol),
        sum(col("n_rows")).as("n_rows"))

  /** Read an asset: (groupCols..., n_rows, approx_distinct). A sketch
    * below capacity holds every distinct hash → exact count. */
  def kmvEstimate(sketches: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame =
    sketches.select(groupCols.map(col) :+ col("n_rows") :+
      when(size(col(KmvCol)) < k, size(col(KmvCol)).cast("double"))
        .otherwise(lit(k - 1.0) /
          hashFrac(element_at(col(KmvCol), k)))
        .as("approx_distinct"): _*)

  /** Pairwise SET ALGEBRA over two KMV assets built with the same k,
    * joined per group: distinct estimates for each side, their union,
    * and — the operation HLL structurally cannot answer — their
    * INTERSECTION. θ = frac of the k-th smallest UNION hash (≤ both
    * sides' thresholds, so every retained hash below θ is known to
    * BOTH sketches if and only if it is in both sets); the
    * intersection estimate is |{h ∈ A ∩ B : frac(h) < θ}| / θ.
    * Sketches below capacity degrade to exact counts (θ = 1 counts
    * every common hash). Groups missing from either side are dropped
    * (no sketch → no estimate). The join moves k-length arrays per
    * group — asset-sized, never corpus-sized. */
  def kmvSetEstimates(a: DataFrame, b: DataFrame,
      groupCols: Seq[String], k: Int): DataFrame = {
    val left = a.select(groupCols.map(col) :+ col(KmvCol).as("__ka"): _*)
    val right = b.select(groupCols.map(col) :+ col(KmvCol).as("__kb"): _*)
    val unioned = slice(array_sort(
      array_union(col("__ka"), col("__kb"))), 1, k)
    val est = (kv: Column) =>
      when(size(kv) < k, size(kv).cast("double"))
        .otherwise(lit(k - 1.0) / hashFrac(element_at(kv, k)))
    val joined = left.join(right, groupCols)
      .withColumn("__ku", unioned)
      .withColumn("__theta",
        when(size(col("__ku")) < k, lit(1.0))
          .otherwise(hashFrac(element_at(col("__ku"), k))))
    joined.select(groupCols.map(col) :+
      est(col("__ka")).as("est_a") :+
      est(col("__kb")).as("est_b") :+
      est(col("__ku")).as("est_union") :+
      (size(filter(array_intersect(col("__ka"), col("__kb")),
        h => hashFrac(h) < col("__theta"))).cast("double") /
        col("__theta")).as("est_inter"): _*)
  }

  def countMin(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"bad depth $depth")
    require(width >= 2, s"bad width $width")
    val rows = (0 until depth).map(j =>
      struct(lit(j).as("j"), (cmHash(col(keyCol), j) % width).as("bucket")))
    df.select(explode(array(rows: _*)).as("e"))
      .groupBy(col("e.j").as("j"), col("e.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate frequencies for `keys` (one row per key) against
    * a [[countMin]] sketch built with the same depth/width: est =
    * min over rows j of the key's cell — an UPPER bound, never below
    * the true count (collisions only add). The sketch is bounded
    * (depth·width cells), so the probe is a broadcast join however
    * large the key list; the classic ε=e/width, δ=e^-depth error
    * contract is measured in SketchesSpec, not assumed. */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame,
      keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2)
    val probes = (0 until depth).map(j =>
      struct(lit(j).as("j"), (cmHash(col(keyCol), j) % width).as("bucket")))
    keys.select(col(keyCol), explode(array(probes: _*)).as("e"))
      .select(col(keyCol), col("e.j").as("j"), col("e.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Per-partition Misra–Gries candidate generation with `k`
    * counters: at most k (value, weight) rows survive per partition,
    * with the classic guarantee that any value whose LOCAL frequency
    * exceeds n_p/(k+1) keeps a counter — so by pigeonhole any GLOBAL
    * heavy hitter (freq·(k+1) > n) is emitted by at least one
    * partition, whatever the row order or partitioning (the summary's
    * per-item estimates are order-dependent; its survivor SET above
    * the threshold is not, which is all [[heavyHitters]] consumes).
    * Unlike [[countMin]] there is no hash-collision overcount and the
    * output size is a hard k·partitions bound, not a grid. */
  def misraGries(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("value")).as[String]
      .mapPartitions(mgPartition(_, k, emitCountSentinel = false))
      .toDF("value", "weight")
  }

  /** The shared per-partition Misra–Gries fold: ≤ k surviving
    * (value, count) pairs, optionally followed by ONE
    * (null, rowsSeen) sentinel so a caller can recover n from the
    * same scan. One implementation so a future change to the counter
    * logic cannot drift between [[misraGries]] and [[heavyHitters]]. */
  private def mgPartition(it: Iterator[String], k: Int,
      emitCountSentinel: Boolean): Iterator[(String, Long)] = {
    val counters = scala.collection.mutable.HashMap[String, Long]()
    var rows = 0L
    it.foreach { v =>
      if (v != null) {
        rows += 1L
        if (counters.contains(v) || counters.size < k)
          counters(v) = counters.getOrElse(v, 0L) + 1L
        else { // decrement-all step: drop zeros
          val dead = scala.collection.mutable.ArrayBuffer[String]()
          counters.keysIterator.foreach { key =>
            val c = counters(key) - 1L
            if (c == 0L) dead += key else counters(key) = c
          }
          dead.foreach(counters.remove)
        }
      }
    }
    val base = counters.iterator.map { case (v, c) => (v, c) }
    if (emitCountSentinel)
      base ++ Iterator((null.asInstanceOf[String], rows))
    else base
  }

  /** EXACT heavy hitters via the sketch-candidates + recount recipe:
    * a [[misraGries]] partition pass (same fold, plus a per-partition
    * row-count sentinel so n comes from the same scan) yields
    * ≤ k·partitions candidate values (recall-complete for
    * freq·(k+1) > n by the guarantee above), the corpus is
    * semi-joined down to candidate rows against the BROADCAST
    * candidate set, and exact counts filter on freq·(k+1) > n —
    * deterministic output regardless of the sketch's internal order
    * sensitivity. Scale shape: two corpus scans, but the only shuffle
    * is the candidate-row recount (heavy values only); the naive form
    * shuffles every distinct value.
    *
    * EAGER, unlike sibling operators: the candidate scan + a bounded
    * driver collect (≤ k·partitions values + one sentinel per
    * partition — the Lloyd-centroid class) run AT CALL TIME, because
    * deriving candidates lazily would re-run the corpus scan on every
    * action over the returned frame. The returned (value, freq)
    * frame re-executes only the recount; candidates are a call-time
    * snapshot of `df`. */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mgRows = df.select(col(keyCol).cast("string").as("value"))
      .as[String]
      .mapPartitions(mgPartition(_, k, emitCountSentinel = true))
      .collect()
    val n = mgRows.filter(_._1 == null).map(_._2).sum
    val cand = mgRows.collect { case (v, _) if v != null => v }.distinct
    val candDf = spark.createDataset(cand.toSeq).toDF("value")
    df.select(col(keyCol).cast("string").as("value"))
      .join(broadcast(candDf), Seq("value"), "left_semi")
      .groupBy("value").agg(count(lit(1)).as("freq"))
      .filter(col("freq") * (k + 1) > n)
      .select(col("value"), col("freq"))
  }

  // --------------------------------------------------------------------
  // Fixed-edge histogram sketch — the MERGEABLE quantile asset (the
  // HDR-histogram production shape, and the quantile sibling of the
  // distinctSketch HLL asset): per group, integer counts per bin over
  // edges PINNED at install time. Counts are exact BIGINTs, so merge
  // (sum by bin) is EXACT — build per day/partition/source, store,
  // roll up months later with O(bins) work and bit-identical results
  // to a single-pass build, whatever the split (spec-asserted).
  // Quantile estimates interpolate inside the winning bin: error is
  // bounded by bin width, deterministic, and replayable arithmetic
  // (the t124 gate has DuckDB rederive the estimates bit-for-bit —
  // impossible for GK/KLL state). percentile_approx/quantileProfile
  // remains the right call for unknown ranges; this asset is for the
  // monitored-metric case where edges are a config constant.
  // --------------------------------------------------------------------

  /** Build the asset: (groupCols..., bin, n) — one narrow shuffle of
    * ≤ |edges|+1 cells per group; the corpus never moves. Bin ids are
    * [[Drift.numericBin]]'s convention: bin k = # edges ≤ x, so bin 0
    * is (-inf, e₀) and bin |edges| is [e_last, inf); NULL values get
    * the NULL bin (kept: a null-share move must be visible in the
    * asset, same argument as PSI's null cell). */
  def histogramSketch(df: DataFrame, groupCols: Seq[String],
      col_ : String, edges: Seq[Double]): DataFrame =
    df.groupBy((groupCols.map(col) :+
        Drift.numericBin(col(col_), edges).as("bin")): _*)
      .agg(count(lit(1)).as("n"))

  /** Roll assets up across any split: sum counts by (group, bin). */
  def histogramMerge(sketches: DataFrame,
      groupCols: Seq[String]): DataFrame =
    sketches.groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(sum(col("n")).as("n"))

  /** Quantile estimates from an asset: one row per (group,
    * percentile) — (groupCols..., p, q). For target rank t = p·N
    * (NULL-bin values excluded from N — quantiles are over observed
    * values), the winning bin is the first with cumulative ≥ t, and
    * the estimate interpolates linearly inside it:
    * lo + (t − cum_below)/n_bin · (hi − lo). The unbounded outer bins
    * have no width — they clamp to their single finite edge (values
    * below e₀ estimate as e₀, above e_last as e_last: the documented
    * saturation of a fixed-range histogram). Closed-form IEEE
    * arithmetic → externally replayable. */
  def histogramQuantile(sketches: DataFrame, groupCols: Seq[String],
      edges: Seq[Double], percentiles: Seq[Double]): DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p > 0.0 && p <= 1.0),
      "percentiles must be in (0, 1]")
    val g = groupCols.map(col)
    val eArr = edges.toArray
    val lo = (b: Column) => // finite low edge of bin b (clamped)
      element_at(array(eArr.map(lit): _*),
        greatest(least(b, lit(eArr.length)), lit(1)).cast("int"))
    val hi = (b: Column) => // finite high edge of bin b (clamped)
      element_at(array(eArr.map(lit): _*),
        greatest(least(b + 1, lit(eArr.length)), lit(1)).cast("int"))
    val session = sketches.sparkSession
    import session.implicits._
    val pDf = percentiles.toDF("p")
    // defensively collapse to one row per (group, bin) first: handed a
    // raw (unmerged) sketch, duplicate bin rows would make the
    // cumulative window's within-bin order arbitrary and the
    // winning-bin filter/interpolation silently wrong. Cheap — the
    // frame is at most groups × (bins+1) rows; identity on an asset.
    val obs = histogramMerge(sketches, groupCols)
      .filter(col("bin").isNotNull)
    val totals = obs.groupBy(g: _*).agg(sum(col("n")).as("__N"))
    val cum = obs.withColumn("__cum",
      sum(col("n")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(g: _*).orderBy(col("bin"))))
      .join(totals, groupCols)
    cum.crossJoin(broadcast(pDf))
      .withColumn("__t", col("p") * col("__N").cast("double"))
      // winning bin: first with cum >= t (t > 0 since p > 0)
      .filter(col("__cum").cast("double") >= col("__t") &&
        (col("__cum") - col("n")).cast("double") < col("__t"))
      .withColumn("q",
        when(col("bin") === 0, lo(col("bin"))) // (-inf, e0) clamps
          .when(col("bin") === eArr.length, lo(col("bin"))) // [e_last, inf)
          .otherwise(lo(col("bin")) +
            (col("__t") - (col("__cum") - col("n")).cast("double")) /
              col("n").cast("double") * (hi(col("bin")) - lo(col("bin")))))
      .select((g :+ col("p") :+ col("q")): _*)
  }
}
