package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic hash sampling — the mixing/splitting side of a
  * training-data pipeline: corpus mixes ("20% of source A, 5% of B"),
  * train/held-out splits, and subsampled dev sets all need sampling
  * that is (a) reproducible run-to-run, (b) coordinated ACROSS tables
  * (the same id samples in or out everywhere), and (c) row-local —
  * `df.sample()` is none of the three (RNG-seeded per partition, so a
  * repartition changes the sample).
  *
  * The decision function is a salted md5 bucket of the id:
  * `bucket(id) = conv(md5(salt|id)[1..8], 16, 10) mod 10⁶` — a pure
  * projection, so sampling never shuffles, survives any partitioning,
  * pushes down past it, and two engines agree on it bit-for-bit (the
  * t30 gate proves the DuckDB mirror). Changing the salt draws an
  * independent sample; keeping it coordinates samples across tables
  * and runs — at 100 TB, "rerun the mix with one rate changed" touches
  * only the changed stratum's rows.
  */
object Sample {

  /** Buckets per unit of probability: rates are truncated to 10⁻⁶
    * resolution (rate → floor(rate·10⁶) buckets). */
  val Buckets = 1000000L

  /** Split-range bounds in INTEGER bucket space: bound i is the
    * running sum of each fraction's own `(f·10⁶).toLong` bucket count
    * — never a truncated cumulative double (0.5+0.3+0.2 accumulates to
    * 0.9999999999999999, whose truncation would leave buckets
    * [999999, 10⁶) silently unassigned to any split). When the
    * fractions are meant to cover everything (sum within 1e-9 of 1),
    * the final bound snaps to exactly [[Buckets]]. Public so oracle
    * generators compare against the identical integers. */
  def splitBounds(fractions: Seq[Double]): Seq[Long] = {
    val b = fractions.scanLeft(0L)((acc, f) => acc + (f * Buckets).toLong)
    if (math.abs(fractions.sum - 1.0) <= 1e-9) b.init :+ Buckets else b
  }

  /** First `nHex` hex chars of md5(salt|id) as a long — the one
    * salted-hash primitive every sampler here derives its uniform
    * draws from; oracle SQL mirrors this expression bit-for-bit, so
    * any change (separator, digest, width) must land here and in
    * every DuckDB mirror together. */
  private def saltedHexLong(id: Column, salt: String, nHex: Int): Column =
    conv(substring(md5(concat(lit(salt), lit("|"), id.cast("string"))),
      1, nHex), 16, 10).cast("long")

  /** Salted hash bucket of an id in [0, 10⁶). */
  def hashBucket(id: Column, salt: String): Column =
    saltedHexLong(id, salt, 8) % Buckets

  /** Keep each row iff bucket(id) < fraction·10⁶ — a deterministic,
    * partitioning-independent `sample(fraction)`. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      salt: String = "graft"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    df.filter(hashBucket(col(idCol), salt) <
      lit((fraction * Buckets).toLong))
  }

  /** Per-stratum rates (e.g. per language or per source): the rates
    * map becomes a broadcast dimension joined on `stratumCol`, so the
    * corpus side never shuffles; strata absent from the map are
    * DROPPED (rate 0). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], salt: String = "graft"): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0))
    val spark = df.sparkSession
    import spark.implicits._
    val rates = fractions.toSeq.map { case (k, f) =>
      (k, (f * Buckets).toLong)
    }.toDF(stratumCol, "__rate_buckets")
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(hashBucket(col(idCol), salt) < col("__rate_buckets"))
      .drop("__rate_buckets")
  }

  /** Sample each stratum DOWN to a target token budget ("~1M tokens
    * per language"): rate_s = budget_s / Σ tokens_s, computed inside
    * the plan (one narrow per-stratum aggregate joined back broadcast)
    * and applied as the same salted-bucket decision as
    * [[stratifiedSample]] — so the draw stays deterministic,
    * partitioning-independent, and coordinated. Strata already under
    * budget keep every row (rate clamps to 1); strata absent from the
    * budgets map drop. Expected sampled tokens per stratum ≈ budget
    * (hash uniformity; exact only in expectation — a hard cap needs
    * [[Pack.packByBudget]]'s prefix sums instead).
    *
    * rate_buckets = min(10⁶, budget·10⁶ DIV Σtokens) is EXACT integer
    * arithmetic (reproducible across engines — the t38 gate);
    * budget·10⁶ must fit a long, hence the < 2⁴² bound (~4.4 T tokens
    * per stratum, far above any single-stratum target). */
  def sampleToTokenBudget(df: DataFrame, idCol: String,
      stratumCol: String, tokenCol: String, budgets: Map[String, Long],
      salt: String = "graft"): DataFrame = {
    require(budgets.values.forall(b => b >= 0 && b < (1L << 42)))
    val spark = df.sparkSession
    import spark.implicits._
    val budgetDf = budgets.toSeq.toDF(stratumCol, "__budget")
    val rates = df.groupBy(col(stratumCol))
      .agg(sum(col(tokenCol)).cast("long").as("__tot"))
      .filter(col("__tot") > 0) // zero-token strata: nothing to sample
      .join(budgetDf, Seq(stratumCol))
      .select(col(stratumCol),
        least(lit(Buckets),
          expr(s"__budget * $Buckets DIV __tot")).as("__rate_buckets"))
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(hashBucket(col(idCol), salt) < col("__rate_buckets"))
      .drop("__rate_buckets")
  }

  /** Temperature-scaled mixture sampling — the standard multi-source
    * training-mix recipe: stratum s gets budget share
    * w_s = tot_s^α / Σ_t tot_t^α of `totalBudget` tokens, so α = 1
    * reproduces natural proportions and α → 0 flattens toward uniform
    * (low-resource strata upweighted). Rates clamp to 1 (a stratum
    * already under its share keeps every row; the unused share is NOT
    * redistributed — deliberate, the α-weights stay interpretable).
    *
    * All stratum math happens in-plan on the tiny per-stratum frame
    * (one narrow aggregate + a 1-row total joined back broadcast);
    * the corpus pass is the same salted-bucket decision as every
    * sampler here — row-local, deterministic, coordinated. The weight
    * chain is float (pow), so w_s rounds to 9 digits before the
    * bucket quantization — both engines reproduce the identical
    * literal rates (the t44 gate). */
  def temperatureMixture(df: DataFrame, idCol: String,
      stratumCol: String, tokenCol: String, alpha: Double,
      totalBudget: Long, salt: String = "graft"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1]")
    require(totalBudget >= 0 && totalBudget < (1L << 42))
    val tots = df.groupBy(col(stratumCol))
      .agg(sum(col(tokenCol)).cast("long").as("__tot"))
      .filter(col("__tot") > 0)
    val total = tots.agg(
      sum(pow(col("__tot"), lit(alpha))).as("__ptot"))
    val rates = tots.crossJoin(broadcast(total))
      .select(col(stratumCol),
        least(lit(Buckets),
          floor(lit(totalBudget.toDouble) *
            round(pow(col("__tot"), lit(alpha)) / col("__ptot"), 9) *
            lit(Buckets) / col("__tot")).cast("long"))
          .as("__rate_buckets"))
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(hashBucket(col(idCol), salt) < col("__rate_buckets"))
      .drop("__rate_buckets")
  }

  /** Disjoint deterministic splits (train/val/test): adds a `split`
    * column = index into `fractions` by contiguous bucket ranges
    * (split i covers [Σ_{j<i} f_j, Σ_{j<=i} f_j)·10⁶), or -1 for rows
    * past the last boundary when Σ f < 1 (unsampled remainder).
    * Disjointness and coverage are by construction; coordination
    * across tables comes from the shared (salt, id) bucket. */
  def hashSplit(df: DataFrame, idCol: String, fractions: Seq[Double],
      salt: String = "graft"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_ >= 0.0) &&
      fractions.sum <= 1.0 + 1e-9)
    val bounds = splitBounds(fractions)
    val b = hashBucket(col(idCol), salt)
    val assigned = fractions.indices.reverse.foldLeft(lit(-1)) {
      (acc, i) => when(b >= bounds(i) && b < bounds(i + 1), lit(i))
        .otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  /** Leakage-safe train/eval split: near-duplicate documents always
    * land on the SAME side. Plain [[hashSplit]] on document ids leaks
    * — a near-dup pair split across train and eval is the classic
    * contaminated-eval failure (the motivation of the dedup
    * literature's split hygiene). Here the split decision hashes the
    * near-dup COMPONENT id ([[NearDup.componentsByMinhash]]): every
    * member of a family shares the component, so the whole family
    * moves together. Output = input columns + (component, split).
    *
    * Scale shape: the component pass is the [[NearDup]] LSH machinery
    * (no corpus×corpus); the split itself is the salted-bucket
    * decision — row-local, partitioning-independent, reproducible. */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
      fractions: Seq[Double], threshold: Double = 0.8,
      salt: String = "graft"): DataFrame = {
    val comps = NearDup.componentsByMinhash(df, idCol, textCol,
      threshold)
    hashSplit(df.join(comps, Seq(idCol)), "component", fractions, salt)
  }

  /** Cluster-balanced (diversity) sampling — "at most `cap` examples
    * per embedding cluster": nearest-centroid assignment against the
    * broadcast `centroids` asset ([[Ann.ivfAssign]] — train them once
    * with `Ann.trainCentroids`, possibly on a sample), then the
    * skew-proof [[capPerGroup]] on the cell. The semantic twin of the
    * per-source frequency cap: where t58 guards against one crawl
    * DOMAIN dominating the mix, this guards against one semantic
    * REGION dominating it (the flat-cluster diversity recipe —
    * SemDeDup's selection stage generalized from near-dups to
    * over-represented topics). Which rows a cell keeps inherits
    * [[capPerGroup]]'s determinism: partitioning-independent and
    * append-stable under a fixed centroid asset. Output:
    * (id, vec, cell) for the kept rows. */
  def clusterBalancedSample(vectors: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, centIdCol: String,
      centVecCol: String, cap: Int,
      salt: String = "graft-cap"): DataFrame =
    capPerGroup(
      graft.operators.Ann.ivfAssign(vectors, idCol, vecCol, centroids,
        centIdCol, centVecCol),
      "cell", idCol, cap, salt)


  /** Per-group frequency cap — "at most `cap` documents per domain",
    * the standard curation guard against one crawler-friendly origin
    * dominating a web-scale training mix. Which rows a group keeps is
    * deterministic: rows rank by (salted md5 bucket of id, id) and
    * survive iff rank ≤ cap, so re-running, repartitioning, or
    * appending OTHER groups never changes a group's kept set, and an
    * under-cap group keeps every row.
    *
    * Exact top-cap-per-key is window-shaped, but a single
    * `row_number() OVER (PARTITION BY group)` forces a 100-TB hot
    * domain through ONE task — window partitions never AQE-split.
    * This runs the two-level refinement instead: rows first rank
    * inside `lanes` hash lanes per group (shuffle key (group, lane) —
    * a hot group spreads across `lanes` tasks). A row's lane-local
    * rank is ≤ its group-global rank, so dropping lane rank > cap
    * keeps a superset of the answer; the survivors — at most
    * lanes·cap rows per group, whatever the group's size — then take
    * the exact global rank in a bounded second window. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      cap: Int, salt: String = "graft-cap", lanes: Int = 16): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    require(lanes > 0, s"lanes must be positive, got $lanes")
    val bucket = hashBucket(col(idCol), salt)
    val lane = pmod(hash(col(idCol)), lit(lanes))
    val local = Window.partitionBy(col(groupCol), lane)
      .orderBy(bucket.asc, col(idCol).asc)
    val global = Window.partitionBy(col(groupCol))
      .orderBy(bucket.asc, col(idCol).asc)
    df.withColumn("__lrn", row_number().over(local))
      .filter(col("__lrn") <= cap).drop("__lrn")
      .withColumn("__grn", row_number().over(global))
      .filter(col("__grn") <= cap).drop("__grn")
  }

  /** Append-mode frequency cap — prices the DELTA, not the corpus,
    * and still returns EXACTLY the batch answer. The selection key
    * (salted md5 bucket, id) is append-stable, and a group's cap-th
    * threshold only ever TIGHTENS as the group grows, so a row
    * [[capPerGroup]] once dropped can never re-enter: capping
    * (existing kept ∪ incoming) equals capping the full history —
    * dropped rows need never be read again. The incremental dedup
    * family's contract (t26/t27), applied to domain capping.
    *
    * `existingKept` must be a prior capPerGroup output under the SAME
    * (cap, salt, lanes); groups the delta never touches pass through
    * by id without re-ranking (their kept set is provably unchanged —
    * appending other groups never moves it). */
  def capPerGroupIncremental(existingKept: DataFrame, incoming: DataFrame,
      groupCol: String, idCol: String, cap: Int,
      salt: String = "graft-cap", lanes: Int = 16): DataFrame = {
    val inCols = existingKept.columns.map(col).toSeq
    val touched = incoming.select(col(groupCol)).distinct()
    // the USING-column joins hoist the key first — restore the
    // caller's column order so the output schema matches the input
    val affected = existingKept.join(touched, Seq(groupCol), "left_semi")
      .select(inCols: _*)
    val untouched = existingKept.join(touched, Seq(groupCol), "left_anti")
      .select(inCols: _*)
    untouched.unionByName(capPerGroup(
      affected.unionByName(incoming.select(inCols: _*)),
      groupCol, idCol, cap, salt, lanes))
  }

  /** Deterministic GLOBAL shuffle — the reproducible training-order
    * permutation every run over the same corpus must agree on. Adds
    * `pos` (0-based, a bijection onto [0, n)): each row's rank under
    * (h, id) where h = the first 15 hex chars of md5(salt|id) as a
    * long — a pure projection, so the permutation is identical on any
    * engine, any partitioning, any rerun; a different salt draws an
    * independent permutation. The id tie-break makes the order total
    * even under 60-bit hash collisions (expected at trillion-row
    * scale).
    *
    * Scale shape: NO single global window. h is uniform on [0, 2^60),
    * so `h >> (60 - bucketsLog2)` buckets rows into contiguous,
    * balanced h-ranges; per-bucket counts come back as broadcast
    * exclusive offsets (the [[graft.operators.Pack]] two-level
    * prefix-sum shape with ranges that need no driver bounds pass),
    * and rank = bucket offset + per-bucket row_number — 2^bucketsLog2
    * parallel windows, 16 bytes per bucket on the driver. */
  def deterministicShuffle(df: DataFrame, idCol: String,
      salt: String = "graft-shuffle", bucketsLog2: Int = 8): DataFrame = {
    require(bucketsLog2 >= 0 && bucketsLog2 <= 20,
      s"bucketsLog2 must be in [0, 20], got $bucketsLog2")
    val src = df.withColumn("__h", saltedHexLong(col(idCol), salt, 15))
      .withColumn("__b", shiftright(col("__h"), 60 - bucketsLog2))
    val counts = src.groupBy("__b").agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init)
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__b", "__boff")
    val w = Window.partitionBy("__b").orderBy(col("__h").asc,
      col(idCol).asc)
    src.join(broadcast(offDf), Seq("__b"))
      .withColumn("pos", col("__boff") + row_number().over(w) - 1)
      .drop("__h", "__b", "__boff")
  }

  /** WEIGHTED sampling without replacement, top-`k` (Efraimidis–
    * Spirakis A-ES): each row draws a deterministic uniform
    * u ∈ [0, 1) from a 52-bit salted md5 of its id and competes with
    * key u^(1/w) — equivalently ln(u)/w, the form used here since
    * only the ORDERING matters — and the k largest keys win. Higher
    * weight → key closer to 0 → more likely sampled, with exactly
    * the ES inclusion distribution; equal weights degrade to uniform
    * hash sampling (spec-asserted).
    *
    * Deterministic and partitioning-independent like every sampler
    * here (u is content-derived, not RNG state), so reruns and
    * repartitions reproduce the sample bit-for-bit and the t94
    * oracle can replay the whole competition. Rows with NULL, NaN,
    * or non-positive weight never compete (filtered — NaN needs its
    * own guard: SQL orders NaN above every double, so `NaN > 0`
    * passes and ln(u)/NaN = NaN would rank FIRST under desc and
    * hijack the whole sample).
    *
    * Scale shape: orderBy+limit plans as TakeOrderedAndProject —
    * each partition keeps its local top-k and only k-row heaps cross
    * to the driver-side merge; no global sort, no full shuffle. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
      k: Int, salt: String = "graft-es"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = saltedHexLong(col(idCol), salt, 13).cast("double") /
      4503599627370496.0 // 16^13 = 2^52
    val w = weightCol.cast("double")
    df.filter(w.isNotNull && !isnan(w) && w > 0)
      .withColumn("__esk", log(u) / w)
      .orderBy(col("__esk").desc, col(idCol).asc)
      .limit(k)
      .drop("__esk")
  }

  /** MIXTURE/EPOCH plan — the data-scheduling step a training run
    * does once per corpus: given target mixture `weights` per source
    * and a token `budget`, how many EPOCHS of each source deliver
    * the target? `epochs_s = min(budget·w̄_s / tokens_s, maxEpochs)`
    * with w̄ the weights normalized over the MAP (driver-side, so the
    * same double literals reach this plan and any oracle mirror —
    * normalizing over data-present sources would make the
    * normalizer's value depend on a cross-engine float summation
    * order). Epochs above 1 mean the source REPEATS — the
    * upsampling a small high-quality source gets in practice —
    * which is what distinguishes this from [[temperatureMixture]]
    * (pure downsampling, no budget, no repeats).
    *
    * Caps are per-source and final (no redistribution of the budget
    * a capped source leaves on the table; feed the shortfall to a
    * second plan call if you want waterfall semantics — a loop is a
    * policy, not an operator). Sources in the map but absent from
    * the corpus contribute nothing; sources in the corpus but not
    * the map get no rows (weight 0). A zero-token source plans 0
    * epochs, not a division blow-up.
    *
    * One tiny agg on sourceCol (#sources rows) joined to a broadcast
    * weights dim — nothing corpus-sized moves.
    *
    * Output: (sourceCol, corpus_tokens, weight, target_tokens,
    * epochs). */
  def mixtureEpochPlan(docs: DataFrame, sourceCol: String,
      tokensCol: String, weights: Map[String, Double], budget: Long,
      maxEpochs: Double): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(maxEpochs >= 0.0, s"maxEpochs must be >= 0, got $maxEpochs")
    require(weights.values.forall(_ >= 0.0), "weights must be >= 0")
    val sumW = weights.values.sum
    require(sumW > 0.0, "weights must not all be zero")
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.map { case (k, w) => (k, w / sumW) }
      .toDF(sourceCol, "weight")
    docs.groupBy(sourceCol)
      .agg(sum(col(tokensCol)).cast("long").as("corpus_tokens"))
      .join(broadcast(wdf), Seq(sourceCol))
      .select(col(sourceCol), col("corpus_tokens"), col("weight"),
        (lit(budget.toDouble) * col("weight")).as("target_tokens"),
        when(col("corpus_tokens") > 0,
          least((lit(budget.toDouble) * col("weight")) /
            col("corpus_tokens"), lit(maxEpochs)))
          .otherwise(lit(0.0)).as("epochs"))
  }

  /** Materialize a [[mixtureEpochPlan]]: each doc of source s
    * repeats floor(epochs_s) times (epoch = 0..⌊e⌋−1) plus one more
    * copy iff its salted hash bucket falls under the fractional part
    * — the standard full-epochs + hash-thinned-partial-epoch
    * expansion, deterministic and partitioning-independent like
    * every sampler here. The partial epoch is an INDEPENDENT
    * hash-uniform subset per source (same id ⇒ same verdict on
    * rerun), so expected tokens per source equal the plan's
    * epochs·tokens without any RNG state.
    *
    * Plan is #sources rows → broadcast join; the expansion itself is
    * a row-local explode of `sequence(0, n−1)` — no shuffle at any
    * scale. Output: docs' columns + `epoch` (long). */
  def mixtureEpochExpand(docs: DataFrame, idCol: String,
      sourceCol: String, plan: DataFrame,
      salt: String = "graft-epoch"): DataFrame = {
    val p = plan.select(col(sourceCol), col("epochs"))
    val full = floor(col("epochs")).cast("long")
    val fracBuckets = floor((col("epochs") - floor(col("epochs"))) *
      Buckets).cast("long")
    val n = full + when(hashBucket(col(idCol), salt) < fracBuckets,
      1L).otherwise(0L)
    docs.join(broadcast(p), Seq(sourceCol))
      .withColumn("__nrep", n)
      // sequence(0, -1) would generate a DESCENDING [0, -1] — guard
      // the n = 0 case to an empty array instead
      .withColumn("epoch", explode(when(col("__nrep") > 0,
        sequence(lit(0L), col("__nrep") - 1))
        .otherwise(array().cast("array<bigint>"))))
      .drop("__nrep", "epochs")
  }
}
