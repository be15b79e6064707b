package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → training-text extraction: the first transform a web-crawl
  * corpus needs before any quality/dedup pass. Everything here is a
  * row-local chain of built-in regexp/string expressions — fully
  * codegen'd, zero shuffle, so the pass is scan-bound at 100 TB and
  * the filters compose with predicate pushdown upstream.
  *
  * Scope: tag/entity-level extraction (markup strip, script/style
  * drop, entity decode, link-density and text-share signals) — the
  * deterministic core of boilerplate removal. DOM-tree heuristics
  * (main-content block scoring) are out of scope: they need a real
  * parser, and the corpus-level signals below are what the curation
  * gates consume.
  *
  * Regex dialect note: every pattern sticks to the syntax subset
  * (non-greedy `.*?`, inline `(?is)` flags, character classes) that
  * Java regex and RE2-family engines interpret identically — the t111
  * oracle replays the same patterns in DuckDB and hash-matches the
  * extracted text.
  */
object HtmlOps {

  /** `<script>`/`<style>` elements vanish WITH their content (their
    * text is code, not prose); `(?is)` = case-insensitive + dotall so
    * multi-line bodies and `<SCRIPT` both match; non-greedy so one
    * block cannot swallow the document. */
  def dropScriptStyle(html: Column): Column =
    regexp_replace(
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")

  /** Remaining tags drop but their CONTENT stays; comments go first
    * (a commented-out tag must not survive the tag pass). */
  def stripTags(html: Column): Column =
    regexp_replace(
      regexp_replace(html, "(?s)<!--.*?-->", " "),
      "(?s)</?[a-zA-Z][^>]*>", " ")

  /** The five XML core entities plus nbsp — the ones boilerplate
    * actually emits; numeric references are left as-is (decoding the
    * full table is a tokenizer concern, not an extraction one). Order
    * matters: `&amp;` decodes LAST or `&amp;lt;` would double-decode
    * to `<`. */
  def decodeEntities(text: Column): Column = {
    val pairs = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    pairs.foldLeft(text) { case (acc, (e, ch)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(e), ch)
    }
  }

  /** Full extraction: drop script/style → strip tags → decode
    * entities → collapse whitespace. */
  def extractText(html: Column): Column =
    trim(regexp_replace(
      decodeEntities(stripTags(dropScriptStyle(html))), "\\s+", " "))

  /** Anchor-text share of the extracted text, the classic boilerplate
    * signal (nav/footer link farms ≈ 1, prose ≈ 0): length of text
    * inside `<a …>…</a>` over length of all extracted text. Both
    * lengths measure the same post-strip normal form, so markup
    * inside the anchor doesn't skew the ratio. 0 when no text. */
  def linkDensity(html: Column): Column = {
    // `<a(\s[^>]*)?>` — attribute part optional but must start with
    // whitespace, so <abbr>/<article>/<aside> never match
    val anchors = regexp_replace(
      concat_ws(" ", regexp_extract_all(dropScriptStyle(html),
        lit("(?is)<a(\\s[^>]*)?>(.*?)</a>"), lit(2))), "\\s+", " ")
    val anchorLen = length(trim(regexp_replace(
      decodeEntities(stripTags(anchors)), "\\s+", " ")))
    val textLen = length(extractText(html))
    when(textLen > 0, anchorLen.cast("double") / textLen.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Extracted-text share of raw markup bytes — near 0 flags
    * markup-only pages (trackers, redirects, tag soup). */
  def textShare(html: Column): Column = {
    val raw = length(html)
    when(raw > 0,
      length(extractText(html)).cast("double") / raw.cast("double"))
      .otherwise(lit(0.0))
  }
}
