package graft.queries

/** Generators for DuckDB oracle SQL fragments that must be *bit-identical*
  * to the Spark expressions they mirror.
  *
  * DuckDB has no conv(hex) and its list_dot_product may not sum in the
  * same order as Spark's sequential fold, so both are expanded into
  * explicit positional arithmetic: left-to-right addition chains match
  * Spark's `aggregate` fold exactly (x1+x2+...+xn, left-assoc).
  */
object DuckSql {

  /** First `n` hex chars of `hexExpr` interpreted as a BIGINT
    * (mirror of Spark conv(substring(h,1,n),16,10)). */
  def hexToLong(hexExpr: String, n: Int): String =
    hexToLongAt(hexExpr, 1, n)

  /** `n` hex chars of `hexExpr` starting at 1-based `start`
    * (mirror of Spark conv(substring(h,start,n),16,10)). */
  def hexToLongAt(hexExpr: String, start: Int, n: Int): String = {
    val terms = (0 until n).map { i =>
      val pow = java.math.BigInteger.valueOf(16L).pow(n - 1 - i)
      s"(CAST(strpos('0123456789abcdef', substr($hexExpr, ${start + i}, 1)) AS BIGINT) - 1) * $pow"
    }
    terms.mkString("(", " + ", ")")
  }

  /** 64-dim dot product of two list columns, expanded to a left-assoc
    * addition chain (1-based DuckDB list indexing). */
  def dot(a: String, b: String, dims: Int): String =
    (1 to dims).map(i => s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)")
      .mkString("(", " + ", ")")

  /** Dot of a list column with literal integer weights. */
  def dotWeights(v: String, w: Seq[Int]): String =
    w.zipWithIndex.map { case (wi, i) =>
      s"CAST($v[${i + 1}] AS DOUBLE) * ${wi.toDouble}"
    }.mkString("(", " + ", ")")

  /** Distinct 3-gram shingle list from a token-list expression. */
  def shingles3(toks: String): String =
    s"list_distinct(list_transform(range(1, greatest(len($toks) - 1, 1)), " +
      s"i -> $toks[i] || ' ' || $toks[i+1] || ' ' || $toks[i+2]))"

  /** Positional (non-distinct) n-gram span list — the DuckDB mirror of
    * TextOps.ngramsRaw: positions 1 .. len-n+1. */
  def ngramsRaw(toks: String, n: Int): String = {
    val join = (0 until n).map(j => s"$toks[i+$j]").mkString(" || ' ' || ")
    s"list_transform(range(1, greatest(len($toks) - ${n - 2}, 1)), " +
      s"i -> $join)"
  }
}
