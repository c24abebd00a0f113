package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines: language ID,
 * quality scoring, token counting, document fingerprinting.
 *
 * Everything is a per-row column expression (narrow, codegen'd, no
 * shuffle) — the shape that scales to 100 TB trivially because it
 * pipelines inside the scan stage.
 */
object TextAnalysis {

  /** Stopword marker sets per language for the n-gram/stopword heuristic
    * language ID. Deliberately tiny and deterministic. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "pas"),
    "es" -> Seq("el", "la", "los", "que", "es", "una", "por", "con")
  )

  private def wordSet(textCol: Column): Column =
    split(lower(textCol), "[^a-zà-ÿ]+")

  private val langsSorted: Seq[String] = langMarkers.keys.toSeq.sorted

  /** Marker-occurrence counts for EVERY language in one codegen'd array
    * pass (order = sorted language codes) — replaces a per-language
    * interpreted `size(filter(words, isin(...)))` that evaluated a
    * lambda per word per language (TextAnalysisSpec pins equality with
    * the HOF witness). */
  def allMarkerHits(textCol: Column): Column =
    graft.functions.VectorExpressions.markerHits(
      wordSet(textCol), langsSorted.map(langMarkers))

  /** Count of marker-word hits for one language. */
  def markerHits(textCol: Column, lang: String): Column =
    element_at(allMarkerHits(textCol), langsSorted.indexOf(lang) + 1)

  /** The interpreted HOF form [[markerHits]] replaced — kept as the
    * equivalence witness. */
  private[graft] def markerHitsHof(textCol: Column, lang: String): Column = {
    val words = wordSet(textCol)
    size(filter(words, w => w.isin(langMarkers(lang): _*)))
  }

  /** Language ID: argmax of marker hits; ties broken by language code
    * order; "und" (undetermined) when no marker hits at all. */
  def langId(textCol: Column): Column = {
    val scored = langMarkers.keys.toSeq.sorted.map(l =>
      struct(markerHits(textCol, l).as("hits"), lit(l).as("lang")))
    val best = array_max(array(scored: _*)) // max on (hits, lang): ties → max lang
    // ties-by-lang-order: array_max picks LAST lang on equal hits; to get
    // deterministic FIRST-lang ties, negate via sort: use max of
    // (hits, reverse-rank) — simpler: sort desc by hits then asc lang.
    val sorted = array_sort(array(scored: _*),
      (a, b) => when(a.getField("hits") > b.getField("hits"), -1)
        .when(a.getField("hits") < b.getField("hits"), 1)
        .when(a.getField("lang") < b.getField("lang"), -1)
        .when(a.getField("lang") > b.getField("lang"), 1)
        .otherwise(0))
    when(sorted.getItem(0).getField("hits") > 0,
      sorted.getItem(0).getField("lang")).otherwise(lit("und"))
  }

  /** Whitespace token count. */
  def tokenCount(textCol: Column): Column =
    size(filter(split(textCol, "\\s+"), t => t =!= ""))

  /** BPE-ish subword count: split on whitespace AND punctuation boundaries,
    * then charge ceil(len/4) subwords per word — a deterministic stand-in
    * for a real tokenizer's token count. */
  def subwordCount(textCol: Column): Column = {
    val pieces = filter(split(textCol, "[\\s\\p{Punct}]+"), t => t =!= "")
    aggregate(pieces, lit(0L), (acc, w) => acc + ceil(length(w) / 4.0).cast("long"))
  }

  /** Quality features: char length, token count, mean word length,
    * punctuation ratio, stopword ratio, and a composite [0,1] score. */
  def qualityFeatures(textCol: Column): Column = {
    val nChars = length(textCol)
    val toks = filter(split(textCol, "\\s+"), t => t =!= "")
    val nToks = size(toks)
    // sum of token lengths == count of non-whitespace chars: one narrow
    // regex pass instead of an interpreted per-token aggregate HOF (the
    // 20-90x penalty class PLANS.md measured; TextAnalysisSpec pins
    // equality with the HOF witness)
    val sumWordLen = length(regexp_replace(textCol, "\\s+", ""))
    val meanWordLen = when(nToks > 0,
      sumWordLen.cast("double") / nToks)
      .otherwise(lit(0.0))
    // One narrow regex pass: punct count = chars removed by stripping the
    // class. (The per-char split+rlike HOF form evaluated an interpreted
    // regex per character — same 20-90x penalty class PLANS.md measured.)
    val nPunct = nChars - length(regexp_replace(textCol, "[\\p{Punct}]", ""))
    val punctRatio = when(nChars > 0, nPunct.cast("double") / nChars).otherwise(0.0)
    val words = wordSet(textCol)
    val stopRatio = when(size(words) > 0,
      markerHits(textCol, "en").cast("double") / size(words))
      .otherwise(0.0)
    struct(
      nChars.as("n_chars"), nToks.as("n_tokens"),
      meanWordLen.as("mean_word_len"), punctRatio.as("punct_ratio"),
      stopRatio.as("stopword_ratio"))
  }

  /** Gopher-style composite quality RULES (Rae et al. 2021 §A1.1
    * heuristics, the widely-adopted web-corpus gate): a document
    * survives when every threshold holds. All inputs are
    * [[qualityFeatures]]' narrow expressions plus two extra one-pass
    * counts, so the whole verdict is a scan-level filter that pushes
    * down — at 100 TB this gate runs in the first pass over raw text
    * and drops the bulk of the corpus before anything shuffles.
    * Thresholds are parameters (defaults follow the paper's commonly
    * cited values); returns a BOOLEAN keep column. */
  def gopherKeep(textCol: Column,
                 minTokens: Int = 50, maxTokens: Int = 100000,
                 minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                 maxSymbolRatio: Double = 0.1,
                 minAlphaWordRatio: Double = 0.8,
                 minStopwordHits: Int = 2): Column = {
    // one shared tokenization; each rule is a narrow expression over it
    // (NOT the full qualityFeatures struct, which would also drag its
    // unused punct/stopword-ratio passes into the predicate)
    val toks = filter(split(textCol, "\\s+"), t => t =!= "")
    val nToks = size(toks)
    val meanWordLen = when(nToks > 0,
      length(regexp_replace(textCol, "\\s+", "")).cast("double") / nToks)
      .otherwise(lit(0.0))
    // hash-or-ellipsis symbol ratio over tokens (the paper gates # and
    // "..." lines)
    val nHash = size(filter(toks, t => t.contains("#")))
    val nEllipsis = size(filter(toks, t => t.contains("...")))
    val symbolRatio = when(nToks > 0,
      (nHash + nEllipsis).cast("double") / nToks).otherwise(0.0)
    // fraction of tokens containing at least one alphabetic character
    val nAlpha = size(filter(toks, t => t.rlike("[A-Za-z]")))
    val alphaRatio = when(nToks > 0,
      nAlpha.cast("double") / nToks).otherwise(0.0)
    val stopHits = markerHits(textCol, "en")
    nToks.between(minTokens, maxTokens) &&
      meanWordLen.between(minMeanWordLen, maxMeanWordLen) &&
      symbolRatio <= maxSymbolRatio &&
      alphaRatio >= minAlphaWordRatio &&
      stopHits >= minStopwordHits
  }

  /** The interpreted per-token HOF [[qualityFeatures]]' mean-word-length
    * replaced — kept as the equivalence witness (TextAnalysisSpec). */
  private[graft] def meanWordLenHof(textCol: Column): Column = {
    val toks = filter(split(textCol, "\\s+"), t => t =!= "")
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (a, w) => a + length(w)).cast("double")
        / size(toks))
      .otherwise(lit(0.0))
  }

  /** PII-style redaction for training corpora: emails, URLs, and long
    * digit runs become typed placeholder tokens. Patterns are
    * RE2-compatible (no backrefs/lookaround), so the same regexes run
    * identically in Java (Spark) and RE2 engines — one narrow codegen'd
    * pass, applied email-first so addresses aren't half-eaten by the
    * digit rule. */
  def redact(textCol: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(textCol,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "https?://[^ ]+", "<URL>"),
      "[0-9]{6,}", "<NUM>")

  /** Encoding-hygiene features for corpus quality filtering: counts of
    * C0 control characters (minus tab/newline/CR, which are legitimate
    * text) and of U+FFFD replacement characters — the mojibake marker a
    * broken decode leaves behind. Each count is one narrow strip-and-
    * diff regex pass (RE2-safe class, so any engine reproduces it). */
  def encodingFeatures(textCol: Column): Column = {
    val n = length(textCol)
    struct(
      (n - length(regexp_replace(textCol,
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))).as("n_control"),
      (n - length(regexp_replace(textCol, "\uFFFD", "")))
        .as("n_replacement"))
  }

  /** Drop C0 control characters (keeping tab/newline/CR) — the scrub
    * applied when [[encodingFeatures]] flags a document worth keeping. */
  def scrubControlChars(textCol: Column): Column =
    regexp_replace(textCol, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")

  /** Document fingerprint: bottom-k sketch of rolling char 8-gram hashes
    * (winnowing-style). Two documents sharing most of their text share most
    * of their bottom-k fingerprint. Returns an array of size ≤ k.
    *
    * Default path is one codegen'd expression per row (NgramFingerprint:
    * hash every char window over its UTF-8 bytes, sort, dedup, take k) —
    * it replaced an interpreted `transform(sequence..., i =>
    * xxhash64(substr(i, gram)))` HOF that evaluated per character, the
    * operator's entire cost at scale. [[fingerprintWith]] keeps the
    * injectable-hash column form for the SQL-oracle gate (md5) and as the
    * equivalence witness (TextAnalysisSpec pins both forms equal under
    * xxhash64). */
  def fingerprint(textCol: Column, gram: Int = 8, k: Int = 16): Column =
    graft.functions.VectorExpressions.ngramFingerprint(textCol, gram, k)

  /** Injectable-hash fingerprint (interpreted HOF): `hashFn` is applied to
    * each char `gram`-window column; bottom-k of the distinct hashes. md5
    * makes it reproducible in any SQL engine (q49's oracle). */
  def fingerprintWith(textCol: Column, hashFn: Column => Column,
                      gram: Int = 8, k: Int = 16): Column = {
    val n = length(textCol)
    val hashes = transform(
      sequence(lit(1), greatest(n - gram + 1, lit(1))),
      i => hashFn(textCol.substr(i, lit(gram))))
    slice(array_sort(array_distinct(hashes)), 1, k)
  }
}
