package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join — the record-linkage dedup class the
  * hash/signature family (MinHash, SimHash, embedding LSH) cannot
  * express: "these two keys differ by at most `maxDist` single-
  * character edits". Used on short linkage keys (titles, names,
  * normalized URLs, doc prefixes), never whole documents — Levenshtein
  * is O(|a|·|b|) per pair, so the whole design is about never running
  * it on a pair that can't win.
  *
  * Candidate generation is the PassJoin pigeonhole (Li, Deng, Wang,
  * Feng: "PassJoin: A Partition-based Method for Similarity Joins",
  * VLDB 2011 — public algorithm, re-derived here): partition a key
  * into `maxDist + 1` segments; any partner within distance d applies
  * at most d edit ops, so at least ONE segment has no op touching its
  * characters, and that segment's exact copy appears in the partner
  * shifted by at most d positions (the net indel count before it).
  * Candidates are therefore an exact-match JOIN on (segment content,
  * segment index, partner length) between each key's segments and
  * each key's probe substrings (every segment position of every
  * compatible partner length, shifted by −d..+d) — a superset of the
  * true pairs by the pigeonhole, then verified with one builtin
  * `levenshtein` call per candidate.
  *
  * Scale shape: segments are (d+1) rows/key and probes
  * (2d+1)²·(d+1) rows/key — constants, not corpus-dependent — and the
  * join shuffles only (id, len, short segment strings), never the
  * corpus. No all-pairs product anywhere; like every banding operator
  * here a pathologically common segment (a stop-word block shared by
  * millions of keys) concentrates its bucket, which the verify stage
  * bounds per-pair — keep linkage keys high-entropy (prefixes, not
  * whole boilerplate) exactly as with MinHash bands. Verification is
  * codegen'd `levenshtein` on candidate pairs only. */
object EditDistance {

  /** All unordered pairs (id_a < id_b) whose `keyCol` values are
    * within Levenshtein distance `maxDist`, with the distance:
    * (id_a, id_b, dist). NULL keys never pair; id type is preserved.
    * maxDist = 0 degrades to exact-key dedup (one segment, zero
    * shift).
    *
    * Keys SHORTER than maxDist + 1 characters have empty pigeonhole
    * segments, so the partition argument cannot cover short×short
    * pairs (e.g. "ab" vs "xy" at d = 2: both substituted characters
    * land in the only nonempty segments). Those run through a
    * dedicated VALUE-level pass — and for them the cross-product IS
    * the answer, not a candidate set: two keys of length ≤ maxDist
    * are ALWAYS within maxDist of each other (levenshtein(a, b) ≤
    * max(|a|, |b|)), so every distinct-value pair the cross emits is
    * an output row, and its size is the answer's, never a plan
    * artifact. The practical corollary: with maxDist at or above
    * your typical key length, the output itself is quadratic in the
    * short-key count — that is the semantics of the query, and the
    * cure is a longer linkage key, not a different plan. Short×long
    * pairs stay with the main path (the long side's segments are all
    * nonempty, and probes are generated from every key regardless of
    * its own length). */
  def editDistancePairs(df: DataFrame, idCol: String, keyCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val d = maxDist
    val n = d + 1 // pigeonhole segment count
    val base = df
      .select(col(idCol).as("__id"), col(keyCol).as("__k"))
      .filter(col("__k").isNotNull)
      .withColumn("__len", length(col("__k")))

    // segment i of a length-L key: 1-based [floor(iL/n)+1, floor((i+1)L/n)]
    def segStart(i: Column, l: Column): Column = floor(i * l / n) + 1
    def segEnd(i: Column, l: Column): Column = floor((i + 1) * l / n)

    val segs = base
      .withColumn("__i", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("__s", segStart(col("__i"), col("__len")))
      .withColumn("__sl",
        (segEnd(col("__i"), col("__len")) - col("__s") + 1).cast("int"))
      .filter(col("__sl") > 0)
      .select(col("__id"), col("__len"), col("__i"),
        col("__k").substr(col("__s").cast("int"), col("__sl")).as("__seg"))

    // probe substrings of key b: for every compatible partner length
    // pl (|pl − len(b)| ≤ d), every segment index, every shift −d..d —
    // the window where an untouched partner segment can land in b
    val probes = base
      .withColumn("__pl",
        explode(sequence(col("__len") - d, col("__len") + d)))
      .filter(col("__pl") > 0)
      .withColumn("__i", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("__ps", segStart(col("__i"), col("__pl")))
      .withColumn("__sl",
        (segEnd(col("__i"), col("__pl")) - col("__ps") + 1).cast("int"))
      .filter(col("__sl") > 0)
      .withColumn("__q", explode(sequence(col("__ps") - d, col("__ps") + d)))
      .filter(col("__q") >= 1 && col("__q") + col("__sl") - 1 <= col("__len"))
      .select(col("__id").as("__idb"), col("__pl"), col("__i"),
        col("__k").substr(col("__q").cast("int"), col("__sl")).as("__seg"))

    val candLong = segs.join(probes,
        segs("__seg") === probes("__seg") &&
          segs("__i") === probes("__i") &&
          segs("__len") === probes("__pl") &&
          segs("__id") =!= probes("__idb"))
      .select(least(segs("__id"), probes("__idb")).as("id_a"),
        greatest(segs("__id"), probes("__idb")).as("id_b"))

    // short-key regime: value-level cross (bounded by |alphabet|^d
    // distinct values), ids expand back by exact key — when many ids
    // share one short key the candidate count equals the TRUE output
    // pair count, which is quadratic by the semantics, not the plan
    val sIds = base.filter(col("__len") < n)
    val sVals = sIds.select(col("__k")).distinct()
    val candShort = sVals.select(col("__k").as("__ka"))
      .crossJoin(sVals.select(col("__k").as("__kb")))
      .filter(levenshtein(col("__ka"), col("__kb")) <= d)
      .join(sIds.select(col("__id").as("__sida"), col("__k").as("__ka")),
        Seq("__ka"))
      .join(sIds.select(col("__id").as("__sidb"), col("__k").as("__kb")),
        Seq("__kb"))
      .filter(col("__sida") =!= col("__sidb"))
      .select(least(col("__sida"), col("__sidb")).as("id_a"),
        greatest(col("__sida"), col("__sidb")).as("id_b"))

    val cand = candLong.unionByName(candShort).distinct()

    val ka = base.select(col("__id").as("id_a"), col("__k").as("__ka"))
    val kb = base.select(col("__id").as("id_b"), col("__k").as("__kb"))
    cand.join(ka, "id_a").join(kb, "id_b")
      .withColumn("dist",
        levenshtein(col("__ka"), col("__kb")).cast("long"))
      .filter(col("dist") <= d)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
