package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY.md §7.2.8).
  *
  * Everything is a `Column => Column` combinator over built-in functions —
  * whole-stage-codegen friendly, no UDFs — so the same expressions run
  * unchanged from local tests to a 1000-executor cluster. Reference
  * behaviors mirrored: tokenizer + quality heuristics are the standard
  * public recipes (length / stopword-ratio / token stats) used by
  * large-scale corpus filtering pipelines.
  */
object TextOps {

  /** Stopword list used by quality/lang-id heuristics (fixed, versioned —
    * changing it changes fingerprints downstream).
    * General HOF rule for this file (learned the hard way, see
    * shingles3Raw): lambda bodies reference ONLY their element
    * arguments — any outer column in a lambda body becomes a
    * per-element re-evaluation of whatever expression the optimizer
    * inlines behind it. */
  val StopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in")
  val StopwordsEs: Seq[String] = Seq("el", "la", "de", "y", "que", "en")

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  // -- row-local text cleaning (the pre-tokenize normalization pass of
  // a corpus pipeline; pure projections, patterns restricted to syntax
  // Java regex and RE2 agree on so the t37 gate can prove parity) --

  /** Drop URLs (http/https through the next whitespace). */
  def stripUrls(text: Column): Column =
    regexp_replace(text, "https?://[^ ]+", " ")

  /** Replace email addresses with a placeholder token (PII hygiene). */
  def maskEmails(text: Column): Column =
    regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<email>")

  /** Collapse space runs and trim — keeps cleaned text tokenizer-
    * compatible (tokens() splits on single spaces). */
  def collapseWhitespace(text: Column): Column =
    trim(regexp_replace(text, "  *", " "))

  /** The composed cleaning pass: URLs out, emails masked, whitespace
    * normalized. */
  def cleanText(text: Column): Column =
    collapseWhitespace(maskEmails(stripUrls(text)))

  /** Replace phone-like digit runs with a placeholder. Two shapes:
    * international (leading '+', digits and dashes, ≥ 7 chars) and
    * NANP (3-3-4 digit groups). Deliberately NOT "any long digit/dash
    * run": that form also matches ISO dates (2026-08-13) and numeric
    * ranges (1999-2026), silently corrupting ordinary text — and RE2
    * has no lookahead to count digits, so shape alternation is the
    * cross-engine-safe way to stay narrow. Callers add locale shapes
    * as extra alternatives. The classes exclude '.' so IPv4 literals
    * are left for [[maskIps]] — the patterns are disjoint and
    * composition order can't change the result. */
  def maskPhones(text: Column): Column =
    regexp_replace(text,
      "\\+[0-9][0-9\\-]{5,}[0-9]|[0-9]{3}-[0-9]{3}-[0-9]{4}",
      "<phone>")

  /** Replace IPv4 literals with a placeholder. */
  def maskIps(text: Column): Column =
    regexp_replace(text,
      "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<ip>")

  /** The composed PII scrub: emails, phones, IPv4s masked. Like
    * [[cleanText]], patterns are restricted to syntax Java regex and
    * RE2 agree on — the t52 gate proves engine parity on synthesized
    * dirt. */
  def scrubPii(text: Column): Column =
    maskIps(maskPhones(maskEmails(text)))

  /** Regex token-count heuristic (word pieces + isolated punctuation)
    * — the cheap prefilter tier. REAL token counts come from the
    * corpus-trained byte-pair encoder ([[Bpe.tokenCount]]), which the
    * budget operators and their gates (t03/t33/t38) now use. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Distinct 3-gram (token) shingles — the unit for MinHash / Jaccard.
    * Unigram sets saturate on small vocabularies; 3-grams keep the
    * Jaccard signal meaningful. */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(shingles3Raw(toks)))
      .otherwise(array().cast("array<string>"))

  /** Positional (non-distinct) 3-gram shingles = [[ngramsRaw]] at
    * n = 3. MinHash only needs these: min over a multiset equals min
    * over its set, so skipping the distinct saves the dedup pass on
    * the signature path. (The slice/zip_with construction and the
    * O(tokens²) optimizer-rewrite trap it avoids are documented once,
    * on ngramsRaw.) */
  def shingles3Raw(toks: Column): Column = ngramsRaw(toks, 3)

  /** Positional (non-distinct) n-gram token spans: n parallel slices
    * zipped pairwise. Documents shorter than n yield an empty array.
    *
    * PERF — why slices/zip_with and NOT
    * `transform(sequence(0, m-1), i -> toks[i] || toks[i+1] || ...)`:
    * a lambda body that references `toks` evaluates the EXPRESSION
    * behind it per element — and after CollapseProject inlines a
    * `withColumn` alias, that expression is the whole `split(text)`.
    * n gets per span made the stage O(tokens²) per document (measured
    * 33 s for a 52k-doc corpus vs 0.4 s fixed; "materialize tokens
    * first" only shrank the constant — any later collapse silently
    * re-introduced the blowup). Each slice below evaluates `toks`
    * once per ROW regardless of how the optimizer rewrites the plan,
    * and the zip_with lambdas touch only their element arguments. */
  def ngramsRaw(toks: Column, n: Int): Column = {
    require(n >= 1)
    // Native kernel (expressions.Ngrams): one loop, one UTF8String
    // concat per gram — replaces the n-slice / n−1-zip_with composed
    // form, which allocated n+n−1 transient arrays per row and paid
    // interpreted-lambda dispatch per element. Same contract
    // bit-for-bit, incl. NULL input → empty array and NULL tokens
    // nulling their spanning grams (see the expression's scaladoc;
    // the historical slices/zip_with construction and the O(tokens²)
    // CollapseProject trap it dodged are documented there too).
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.Ngrams(
        org.apache.spark.sql.GraftColumnBridge.expression(toks), n))
  }

  /** MinHash via affine permutations over ONE base hash per shingle:
    * h_k(x) = (A_k * h32(x) + B_k) mod P. One md5 per shingle total
    * (not one per permutation) — at 100 TB the md5 is the dominant
    * cost, so k permutations must not mean k hashes.
    *
    * Overflow bound: h < 2^32 and A_k < 2^30 for every k in [0, 64)
    * (A(63) = 1,040,875,571 < 2^30 = 1,073,741,824), so A*h < 2^62 and
    * A*h + B < 2^63 — no signed-long wrap, and `%` on nonnegative
    * operands matches any engine's semantics. k >= 64 is rejected. */
  val MinhashP = 4294967311L // prime > 2^32
  val MinhashMaxK = 64
  def minhashA(k: Int): Long = {
    require(k >= 0 && k < MinhashMaxK, s"minhash permutation k=$k out of range")
    536870909L + 2L * k * 4000037L // odd, < 2^30 for all k < 64
  }
  def minhashB(k: Int): Long = {
    require(k >= 0 && k < MinhashMaxK, s"minhash permutation k=$k out of range")
    3L + k * 982451653L
  }

  /** Min over pre-hashed shingles of the k-th affine permutation. */
  def affineMin(hashes: Column, k: Int): Column =
    array_min(transform(hashes,
      h => (lit(minhashA(k)) * h + lit(minhashB(k))) % lit(MinhashP)))

  /** 32-bit token hash for SimHash bit votes (md5 chars 1–8). */
  def tokenHash32(tok: Column): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long")

  /** Second independent 32-bit token hash (md5 chars 9–16) — the high
    * half of the 64-bit SimHash. Two 32-bit halves instead of one
    * 16-hex-char conv: conv yields the UNSIGNED decimal string, whose
    * top-bit values exceed Long and cast to NULL. */
  def tokenHash32b(tok: Column): Column =
    conv(substring(md5(tok), 9, 8), 16, 10).cast("long")

  /** Stopword-profile language heuristic: the language whose stopword
    * profile hits more tokens wins; ties (incl. zero signal) are
    * honest "und". A real system plugs a trained model here — the
    * *shape* (row-local Column, no UDF) is the contract. */
  def langId(toks: Column): Column = {
    val en = size(filter(toks, t => t.isin(StopwordsEn.map(w => w: Any): _*)))
    val es = size(filter(toks, t => t.isin(StopwordsEs.map(w => w: Any): _*)))
    when(en > es, "en").when(es > en, "es").otherwise("und")
  }

  /** Ratio of tokens found in `words`, rounded — quality-score component. */
  def stopwordRatio(toks: Column, words: Seq[String]): Column = {
    val hits = size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))
    round(hits.cast("double") / size(toks), 4)
  }

  /** Mean token length, rounded. Fold is sequential → deterministic. */
  def avgTokenLen(toks: Column): Column =
    round(aggregate(toks, lit(0L), (acc, x) => acc + length(x))
      .cast("double") / size(toks), 4)

  /** Document fingerprint: canonicalized md5 (exact-dedup / lineage key). */
  def fingerprint(text: Column): Column = md5(lower(trim(text)))

  /** Polynomial rolling hash over the canonicalized character stream —
    * h = (h·B + code(c)) mod P, the Rabin–Karp recurrence. Cheaper
    * than md5 (no digest machinery, pure integer fold) and the
    * building block for content-defined chunking. Bounds: h < P < 2^31
    * and B·h + code < 2^36 — no long overflow. Sequential fold →
    * deterministic, mirrored exactly by the oracle. */
  val RollingB = 31L
  val RollingP = 1000000007L
  def rollingHash(text: Column): Column =
    aggregate(split(lower(trim(text)), ""),
      lit(0L),
      (acc, c) => (acc * RollingB + ascii(c)) % RollingP)
}
