package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the key-maker for crawl-level dedup and
  * per-domain source caps: two spellings of the same page must map to
  * one canonical string BEFORE any exact/near dedup sees them.
  * Row-local codegen'd regexp/list expressions, no shuffle; the t113
  * oracle pins the output against closed-form expected URLs (not a
  * regex replay).
  *
  * Normalizations applied (the deterministic, always-safe set):
  * scheme + host lowercased; default ports stripped (http:80,
  * https:443 — other schemes keep theirs); empty path → "/";
  * fragment dropped; query params with empty keys dropped, tracking
  * params (utm_*, fbclid, gclid) dropped, the rest SORTED byte-wise.
  * Out of scope (documented, not silently wrong): percent-encoding
  * case, dot-segment resolution, IDN — they need a real URL parser
  * and belong to the fetcher, not the corpus key.
  */
object UrlOps {

  private val UrlRe =
    "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?$"

  /** Lowercased scheme, or '' when the value is not a URL. */
  def scheme(url: Column): Column = lower(regexp_extract(url, UrlRe, 1))

  /** Lowercased host with any port stripped ('' for non-URLs). */
  def host(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, UrlRe, 2)), ":[0-9]+$", "")

  private def authority(url: Column): Column = {
    val auth = lower(regexp_extract(url, UrlRe, 2))
    val sch = scheme(url)
    when(sch === "http", regexp_replace(auth, ":80$", ""))
      .when(sch === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
  }

  private def path(url: Column): Column = {
    val p = regexp_extract(url, UrlRe, 3)
    when(p === "", lit("/")).otherwise(p)
  }

  /** Canonical sorted query: '?k=v&…' or '' when nothing survives. */
  private def query(url: Column): Column = {
    val raw = regexp_extract(url, UrlRe, 4) // includes leading '?'
    // case-insensitive tracking-param match (UTM_SOURCE=x is the same
    // tracking link as utm_source=x) and empty-KEY params ('=v', '=')
    // dropped — both per the scaladoc contract; bare-name params
    // ('flag', no '=') are kept, they are meaningful keys
    val params = filter(
      split(regexp_replace(raw, "^\\?", ""), "&"),
      p => {
        val lp = lower(p)
        p =!= "" && !p.startsWith("=") && !lp.startsWith("utm_") &&
          !lp.startsWith("fbclid=") && !lp.startsWith("gclid=") &&
          lp =!= "fbclid" && lp =!= "gclid"
      })
    val sorted = array_join(array_sort(params), "&")
    when(sorted === "", lit("")).otherwise(concat(lit("?"), sorted))
  }

  /** Full canonical form; non-URLs (no scheme://) pass through
    * unchanged so a mixed column never loses rows. */
  def canonicalUrl(url: Column): Column =
    when(regexp_extract(url, UrlRe, 1) === "", url)
      .otherwise(concat(scheme(url), lit("://"), authority(url),
        path(url), query(url)))
}
