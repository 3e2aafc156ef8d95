package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * column expressions — no UDFs — so whole-stage codegen spans the full
  * pipeline and the work distributes embarrassingly (per-row, no shuffle).
  */
object TextFunctions {

  /** Whitespace tokenization (the corpus is space-separated words). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Token count: whitespace tokenizer. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish sub-word token estimate: words + punctuation marks counted
    * separately, long words contribute ceil(len/4) pieces (a standard
    * heuristic approximation of byte-pair-encoded token counts). */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(
      transform(tokens(text), t => ceil(length(t).cast("double") / lit(4.0)).cast("long")),
      lit(0L), (acc, x) => acc + x) +
      length(regexp_replace(text, "[^.!?,;:]", "")).cast("long")

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.!?,;:]", "")).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Tiny by design: language ID at 100 TB must stay a
    * map-only, broadcast-free column expression. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den", "nicht", "von"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "est", "que", "pour", "dans"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Fraction of tokens that are stopwords of the given language. */
  def stopwordRatio(text: Column, lang: String): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(stopwords(lang): _*))).cast("double") /
      greatest(size(toks).cast("double"), lit(1.0))
  }

  /** Heuristic language ID: argmax of per-language stopword hit counts,
    * ties broken by language code (deterministic). Argmax is the
    * max-of-structs idiom — still a pure column expression. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(filter(toks, t => t.isin(words: _*))).as("score"),
        lit(lang).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }

  /** Document quality score in [0,1]: blend of length band, punctuation
    * presence, stopword density, and lexical diversity. IEEE-exact ops
    * only (+,*,/ and comparisons) so results are engine-portable. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val lenScore = when(n >= 20 && n <= 1000, lit(1.0))
      .when(n >= 5, lit(0.5)).otherwise(lit(0.0))
    val diversity = size(array_distinct(toks)).cast("double") / greatest(n, lit(1.0))
    val stopScore = {
      val r = stopwordRatio(text, "en")
      when(r >= 0.05 && r <= 0.6, lit(1.0)).otherwise(lit(0.25))
    }
    (lenScore * lit(0.4)) + (diversity * lit(0.4)) + (stopScore * lit(0.2))
  }

  /** Order-insensitive document fingerprint: md5 of the sorted distinct
    * token bag — catches shuffled/reordered near-duplicates exactly. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Rolling hash — order-SENSITIVE fingerprint: a Rabin–Karp polynomial
    * over the whitespace-normalized character stream,
    * h_i = (h_{i-1}·131 + codepoint_i) mod (2^31−1), one left-to-right
    * pass. Engine-portable by construction (integer arithmetic over
    * Unicode codepoints — no engine-private hash), so the DuckDB oracle
    * certifies it bit-for-bit; max intermediate is < 2^39, overflow-free
    * under ANSI mode. */
  def rollingHash(text: Column): Column = {
    val norm = regexp_replace(trim(text), "\\s+", " ")
    aggregate(split(norm, ""), lit(0L),
      (acc, c) => (acc * lit(131L) + ascii(c)) % lit(2147483647L))
  }

  // ---- PII detection / redaction -------------------------------------------
  // The regexes stay inside the dialect subset Java's engine and RE2
  // (DuckDB) match identically — character classes, bounded repetition,
  // ASCII \b, greedy quantifiers, no backrefs/lookaround — so counts and
  // replacements reproduce bit-for-bit on the oracle.

  /** Email addresses (practical form, not full RFC 5322). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dotted-quad IPv4 (syntactic; no 0-255 range check). */
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** Hyphenated phone numbers in the 2-3-3-4 layout TPC-H uses. */
  val phoneRe = "\\b\\d{2}-\\d{3}-\\d{3}-\\d{4}\\b"

  /** Per-document PII match counts: (n_emails, n_ipv4, n_phones). A pure
    * map over codegen'd `regexp_count` — the 100 TB sweep is
    * embarrassingly parallel, no shuffle. */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(emailRe)).cast("long").as("n_emails"),
    regexp_count(text, lit(ipv4Re)).cast("long").as("n_ipv4"),
    regexp_count(text, lit(phoneRe)).cast("long").as("n_phones"))

  /** Redacted text: emails, then IPv4s, then phones replaced by typed
    * placeholders (the order is part of the contract — email local parts
    * contain digits the later passes must never see pre-redaction). */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"),
        ipv4Re, "[IP]"),
      phoneRe, "[PHONE]")
}
