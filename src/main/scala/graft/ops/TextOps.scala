package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Parity

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, document
  * fingerprinting. All pure Column expressions — codegen-friendly, no
  * UDFs, no driver-side loops; each scales as a single narrow map over
  * the corpus.
  */
object TextOps {

  /** Whitespace tokenization (the 100-TB-safe default: no regex NFA). */
  def tokens(text: Column): Column = split(text, " ")

  def normalized(text: Column): Column = lower(trim(text))

  /** Token count, whitespace-delimited. Long for cross-engine schema
    * parity (DuckDB len() is BIGINT).
    */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword token count: runs of lowercase letters (a crude
    * but deterministic stand-in for a real tokenizer's word pieces).
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+"), lit(0))).cast("long")

  /** Stopword occurrence count over whitespace tokens. */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), w => w.isInCollection(stopwords))).cast("long")

  /** Mean token length in chars: (chars − separators) / tokens. */
  def avgTokenLength(text: Column): Column = {
    val n = tokenCount(text)
    (length(text).cast("long") - (n - 1)).cast("double") / n.cast("double")
  }

  /** Punctuation ratio (explicit class, identical regex semantics in
    * Spark and DuckDB).
    */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double") /
      length(text).cast("double")

  /** Heuristic quality score in [0,100]: fixed penalties for short
    * docs, stopword-heavy text, and short average tokens — the shape of
    * a pretraining-corpus quality filter, deterministic end to end.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = tokenCount(text)
    val stopRatio = stopwordCount(text, stopwords).cast("double") / nTok.cast("double")
    val raw = lit(100.0) -
      when(nTok < 40, 20.0).otherwise(0.0) -
      when(stopRatio > 0.25, 15.0).otherwise(0.0) -
      when(avgTokenLength(text) < 4.0, 10.0).otherwise(0.0) -
      when(length(text) < 200, 5.0).otherwise(0.0)
    least(greatest(raw, lit(0.0)), lit(100.0))
  }

  /** n-gram heuristic language ID: stopword density of English marker
    * words. Real language ID would score character n-gram profiles per
    * language; the plumbing (ratio → thresholded CASE) is identical.
    */
  def langId(text: Column, markers: Seq[String]): Column = {
    val ratio = stopwordCount(text, markers).cast("double") /
      tokenCount(text).cast("double")
    when(ratio >= 0.12, "en").when(ratio >= 0.06, "mixed").otherwise("unk")
  }

  /** Document fingerprint: 60-bit digest of the normalized text
    * (md5-based so the DuckDB oracle computes the identical value).
    * GroupBy on this fingerprint is the scalable exact-dedup key — a
    * fixed 8-byte shuffle key instead of the full document text.
    */
  def fingerprint(text: Column): Column = Parity.md5_60(normalized(text))

  /** PII patterns shared by [[redactPii]] and its counters. Kept to
    * constructs with identical semantics in Java regex and RE2
    * (character classes, bounded repeats, \d, \b) so the DuckDB oracle
    * can run the very same patterns.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val LongNumRe = "\\d{9,}"

  /** PII redaction — the scrub pass a training corpus runs before
    * anything else sees the text: emails, IPv4 addresses, and long
    * digit runs (card/SSN/phone-shaped) replaced with typed tokens.
    * Order matters and is fixed: emails first (their local parts often
    * contain digit runs), then IPs (octets are short, but a redacted
    * long-number inside an IP would break the later pattern), then
    * bare long numbers. Pure chained regexp_replace — codegen'd, one
    * narrow map over the corpus, no UDF.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      LongNumRe, "<NUM>")

  /** Match counts per PII class on the RAW text (counted before any
    * replacement so classes don't shadow each other).
    */
  def piiCounts(text: Column): (Column, Column, Column) = (
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(LongNumRe), lit(0))).cast("long"))

  /** URL host extraction (capture group 1) — the entity a
    * source-quality filter keys on.
    */
  val UrlHostRe = "https?://([A-Za-z0-9.-]+)"
  def domains(text: Column): Column =
    regexp_extract_all(text, lit(UrlHostRe), lit(1))

  /** HTML extraction patterns + entity table, shared with the
    * generated oracle SQL so both engines run the identical pipeline.
    * Patterns stay inside the RE2 ∩ Java-regex common subset
    * (non-greedy ranges, `(?s)` inline flag, plain classes — no
    * backreferences, no lookaround) and every replacement string is
    * free of Java's `$`/`\` and DuckDB's `\` replacement
    * metacharacters.
    */
  val ScriptRe = "(?s)<script[^>]*>.*?</script>"
  val StyleRe = "(?s)<style[^>]*>.*?</style>"
  val TagRe = "<[^>]*>"
  /** Decode order matters and is fixed: `&lt;`/`&gt;` AFTER tag strip
    * (so escaped markup stays text, never becoming strippable tags)
    * and `&amp;` LAST (so `&amp;lt;` decodes to the literal `&lt;`,
    * not to `<`).
    */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Raw HTML → text: script/style block removal, tag strip, entity
    * decode, whitespace collapse — the step UPSTREAM of every text
    * operator in a web-corpus pipeline (language ID, quality scores,
    * dedup all assume markup-free text). A chained regexp_replace
    * pipeline: codegen'd, one narrow map over the corpus, no UDF, no
    * parser state — the scale-safe 99% of boilerplate extraction
    * (DOM-aware readability scoring would need a real parser and is
    * out of engine scope).
    */
  def extractHtml(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(html, ScriptRe, " "), StyleRe, " ")
    val noTags = regexp_replace(noBlocks, TagRe, " ")
    val decoded = HtmlEntities.foldLeft(noTags) {
      case (c, (entity, repl)) => regexp_replace(c, entity, repl)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The shared windowed-token-slice kernel of Corpus.chunkOverlap and
    * Dedup.dedupLines: window j (0-based) covers tokens
    * [j·step+1, j·step+width] (1-indexed slice), joined back to text
    * with single spaces. Callers own their window-count and
    * empty-input semantics — only the positional arithmetic (a past
    * source of off-by-ones) lives here, once.
    */
  def tokenWindows(toks: Column, nWindows: Column, step: Int,
                   width: Int): Column =
    transform(sequence(lit(0), nWindows - 1),
      i => concat_ws(" ", slice(toks, i * step + 1, lit(width))))

  /** URL canonicalization — the key for URL-level dedup, the FIRST
    * (and cheapest) dedup stage of a web corpus: most exact dups are
    * the same page crawled under trivially different URLs. Lowercase,
    * strip scheme, fragment, query string, a leading "www.", and a
    * trailing slash — five chained anchored regexp_replace steps, all
    * single-match so Java's replace-all and DuckDB's replace-first
    * semantics agree; codegen'd, no UDF.
    */
  def normalizeUrl(url: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(lower(url), "^https?://", ""),
            "#.*$", ""),
          "\\?.*$", ""),
        "^www\\.", ""),
      "/$", "")
}
