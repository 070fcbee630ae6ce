package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline: token
  * counting, n-gram shingling, quality scoring, language ID, document
  * fingerprinting, simhash. All built from codegen'd built-ins /
  * higher-order functions — no UDFs — so they stay inside whole-stage
  * codegen and scale linearly over a 100 TB documents table.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text (empty text → empty array). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** ==Shared-token (`*Of`) variants==
    * Every text metric below starts from [[tokens]] — a full regex split
    * of the document. A projection that derives several metrics from the
    * same text therefore embeds the split once PER METRIC, and codegen
    * subexpression elimination does NOT reliably unify them across
    * `when`-guarded trees (measured r15, CodegenDump: the q32 quality
    * projection carried 3 split call sites, q33's langId 10 — ~3–10× the
    * tokenize cost, which dominates these queries' executor CPU). The
    * `*Of` variants take the token array as a COLUMN so callers can
    * project it once (`tokens(text).as("_toks")` in a separate select —
    * CollapseProject never re-inlines a non-cheap expression consumed
    * more than once) and share one split across all metrics. The
    * text-only overloads delegate with `tokens(text)`, so their
    * expression trees — and results — are unchanged.
    */
  def tokenCountOf(toks: Column): Column = size(toks)

  /** BPE-style pre-tokenizer pieces: GPT-2's pre-tokenization pattern
    * reduced to constructs Java regex and RE2 treat identically —
    * contraction suffixes, letter runs, digit runs, and punctuation runs,
    * each with an optional leading space. This is the piece count a BPE
    * vocabulary would train over (the subsequent merges only split within
    * pieces), so it is the standard cheap token-budget estimator.
    */
  val bpePiecePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+"

  def bpePieces(text: Column): Column =
    regexp_extract_all(text, lit(bpePiecePattern), lit(0))

  def bpePieceCount(text: Column): Column = size(bpePieces(text))

  /** Word n-gram shingles joined by single spaces. Texts with fewer than
    * n tokens yield an empty array — without the guard, sequence(1, 0)
    * produces the DESCENDING array [1, 0] and slice(_, 0, _) throws at
    * runtime.
    */
  def wordNGrams(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
  }

  /** Distinct word n-gram shingles in first-occurrence order — the fused
    * codegen'd form of `array_distinct(wordNGrams(text, n))` (see
    * [[graft.functions.NGramShingles]]); the shingle-build hot path for
    * Jaccard / MinHash dedup.
    */
  def distinctWordNGrams(text: Column, n: Int): Column =
    graft.functions.NGramShingles(tokens(text), n)

  /** Character n-gram shingles; same short-input guard as wordNGrams
    * (substr(0, n) silently aliases substr(1, n), duplicating grams).
    */
  def charNGrams(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "in", "and", "is", "it", "for")

  def stopwordCount(text: Column, stop: Seq[String] = defaultStopwords): Column =
    // fused hash-set count, not filter+isin: the In literal chain costs
    // O(tokens × stopwords) string equality per row (see VocabHits)
    graft.functions.VocabHits(tokens(text), stop)

  def stopwordRatio(text: Column, stop: Seq[String] = defaultStopwords): Column =
    stopwordRatioOf(tokens(text), stop)

  /** [[stopwordRatio]] over a pre-projected token array (see
    * [[tokenCountOf]]'s scaladoc for why).
    */
  def stopwordRatioOf(toks: Column,
                      stop: Seq[String] = defaultStopwords): Column = {
    val n = size(toks)
    when(n === 0, 0.0)
      .otherwise(graft.functions.VocabHits(toks, stop) / n.cast("double"))
  }

  /** Mean token length = non-space chars / token count. */
  def avgWordLen(text: Column): Column = avgWordLenOf(text, tokens(text))

  /** [[avgWordLen]] over a pre-projected token array. The non-space
    * char count can be shared too (`nsLen`) when another metric in the
    * same projection needs it (q32's quality score).
    */
  def avgWordLenOf(text: Column, toks: Column,
                   nsLen: Option[Column] = None): Column = {
    val n = size(toks)
    when(n === 0, 0.0)
      .otherwise(nsLen.getOrElse(
        length(regexp_replace(trim(text), "\\s+", ""))) / n.cast("double"))
  }

  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise((length(text) -
        length(regexp_replace(text, "[\\p{Punct}]", ""))) / length(text).cast("double"))

  /** Heuristic quality score in [0,1] for filtering web-scale corpora:
    * rewards mid-length docs, plausible word lengths, some stopwords, low
    * punctuation density (the shape of the reference-free quality filters
    * used in LLM data pipelines).
    */
  def qualityScore(text: Column): Column = qualityScoreOf(text, tokens(text))

  /** [[qualityScore]] over a pre-projected token array (and optionally a
    * pre-projected non-space char count shared with [[avgWordLenOf]]) —
    * identical arithmetic, one tokenize per row.
    */
  def qualityScoreOf(text: Column, toks: Column,
                     nsLen: Option[Column] = None): Column = {
    val n = size(toks).cast("double")
    val lenScore = least(n / 20.0, lit(1.0)) * when(n > 1000, 0.5).otherwise(1.0)
    val awl = avgWordLenOf(text, toks, nsLen)
    val wordScore = when(awl.between(3.0, 10.0), 1.0).otherwise(0.5)
    val stopScore = when(stopwordRatioOf(toks) > 0.01, 1.0).otherwise(0.7)
    val punctScore = when(punctRatio(text) < 0.2, 1.0).otherwise(0.5)
    round(lenScore * wordScore * stopScore * punctScore, 6)
  }

  /** Exact-dup fingerprint: md5 of whitespace-normalized lowercased text. */
  /** PII scrubbing (the redaction pass of a training-data pipeline):
    * emails and IPv4 literals replaced by type tokens. Patterns are
    * RE2-compatible (no lookaround) so an external SQL engine reproduces
    * them verbatim — the q72 oracle relies on this. All codegen'd
    * regexp built-ins; no UDFs.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}(?:\\.\\d{1,3}){3}\\b"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      Ipv4Pattern, "<IP>")

  def piiCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))) +
      size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0)))

  def fingerprint(text: Column): Column =
    md5(lower(concat_ws(" ", tokens(text))))

  /** Prefix fingerprint (first n tokens) — catches truncation/extension
    * near-dups cheaply.
    */
  def prefixFingerprint(text: Column, n: Int = 5): Column =
    md5(lower(concat_ws(" ", slice(tokens(text), 1, n))))

  /** Language-ID by stopword-profile hits: argmax over per-language marker
    * word counts; "und" (undetermined) when nothing matches. N-gram-profile
    * classification reduced to its codegen-able core.
    */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "you", "that", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "ich"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "que"),
    "es" -> Seq("el", "de", "que", "la", "los", "es", "una", "por"),
    "zh" -> Seq("的", "是", "不", "我", "了", "在", "人", "有"))

  def langId(text: Column): Column = langIdOf(text, tokens(text))

  /** [[langId]] over a pre-projected token array — the 5 per-language
    * VocabHits passes then share ONE tokenize (q33 previously embedded
    * 10 split call sites per row; see [[tokenCountOf]]).
    */
  def langIdOf(text: Column, toks: Column): Column = {
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(graft.functions.VocabHits(toks, words).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    // CJK text is unsegmented — whitespace tokens never equal the zh
    // marker WORDS, so zh must be detected at the CHARACTER level first:
    // majority-CJK-codepoint text is zh regardless of incidental Latin
    // stopwords (which would otherwise mislabel it "en").
    val cjk = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))
    when(cjk * 2 > length(text), lit("zh"))
      .when(best.getField("hits") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** 64-bit simhash over whitespace tokens as ONE scalar expression: hash
    * each token (built-in codegen'd xxhash64), fold the hashes with the
    * custom codegen'd [[graft.functions.Simhash64]] expression. No explode,
    * no 64-column aggregation, no join-back — zero shuffles,
    * embarrassingly parallel over the corpus.
    */
  def simhash(text: Column): Column =
    graft.functions.Simhash64(transform(tokens(text), t => xxhash64(t)))

  /** Returns df with an added `simhashCol` (see [[simhash]]). */
  def withSimhash(df: DataFrame, textCol: String, idCol: String,
                  simhashCol: String = "simhash"): DataFrame =
    df.withColumn(simhashCol, simhash(col(textCol)))

  /** Hamming distance between two simhash longs (codegen'd bit_count). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
