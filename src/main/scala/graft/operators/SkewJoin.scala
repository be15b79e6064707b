package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed joins — the classic remedy when
  * one join key carries a disproportionate share of a big fact side
  * (the crawl-domain / hot-customer / default-value key).
  *
  * First line of defense is AQE's runtime skew-join split
  * (spark.sql.adaptive.skewJoin.*), which re-splits oversized
  * sort-merge partitions after the shuffle writes. Explicit salting
  * is the DETERMINISTIC fallback for the cases AQE doesn't cover:
  * shuffled-hash joins, a hot key so large even one split of it
  * spills, or plans that must behave identically run over run
  * (replayable pipelines). The trade is explicit: the small side is
  * replicated `salts`× through the shuffle, the big side's hot key
  * spreads over `salts` reducers.
  *
  * Mechanics: the big side gets a salt derived by HASHING ITS WHOLE
  * ROW (xxhash64 over all columns, mod salts) — deterministic, no
  * rand(): a nondeterministic salt re-rolled on task retry is the
  * classic repartition-retry duplication hazard. The DETERMINISM
  * CAP that buys: spread under a hot key is bounded by the number of
  * DISTINCT row values carrying that key — byte-identical duplicate
  * rows hash to one salt and stay on one reducer. When duplicates
  * dominate the hot key (the default-value-key pathology), pass
  * `saltBy` — any column(s) that distinguish the duplicates (a
  * unique id, a file/line lineage column) — and the salt hashes
  * those instead. The small side cross-joins a literal 0..salts-1
  * array (an explode, NOT a shuffle). The join key becomes
  * (keys..., salt), so each reducer sees its salt's share of the hot
  * key's rows. Result is bit-identical to the unsalted join
  * (SkewJoinSpec proves parity and spread).
  */
object SkewJoin {

  private val SaltCol = "__graft_salt"

  /** Inner/left equi-join of a skewed `big` side against a `small`
    * side on `keys`, salted `salts` ways. `small` must be the
    * deduplicated dimension side (unique per key-tuple) — each of its
    * rows is replicated once per salt, so a non-unique small side
    * would multiply matches exactly as it would unsalted. `saltBy`:
    * columns whose hash drives the salt (default: the whole row —
    * see the duplicate-row cap above). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner",
      saltBy: Seq[String] = Nil): DataFrame = {
    require(salts >= 2, s"salts must be >= 2, got $salts")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting supports inner/left joins, got $joinType")
    require(!big.columns.contains(SaltCol) && !small.columns.contains(SaltCol),
      s"inputs must not already carry the internal salt column '$SaltCol'")
    // default salt source = every HASHABLE big-side column: xxhash64
    // rejects map-typed columns at analysis with an obscure error, so
    // filter them here; if nothing hashable distinguishes the rows the
    // caller must name a salt source explicitly
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val saltSrc =
      if (saltBy.nonEmpty) saltBy
      else big.schema.fields.filter(f => hashable(f.dataType))
        .map(_.name).toSeq
    require(saltSrc.nonEmpty,
      "no hashable big-side column to derive the salt from — pass saltBy")
    val saltedBig = big.withColumn(SaltCol,
      pmod(xxhash64(saltSrc.map(col): _*), lit(salts.toLong))
        .cast("int"))
    val saltedSmall = small.withColumn(SaltCol,
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall, keys :+ SaltCol, joinType)
      .drop(SaltCol)
  }
}
