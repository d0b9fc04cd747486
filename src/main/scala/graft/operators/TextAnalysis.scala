package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Text-analysis operators for LLM-data pipelines (SURVEY §2B X5): token
  * counting, quality scoring, language ID, fingerprinting. Everything is
  * built-in `functions._` (whole-stage codegen'd, no UDFs) except the
  * fingerprint, which is a native expression (HashExpressions.scala). All are
  * per-row map-only operators — they add zero shuffles at any scale.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text (empty text → empty array, not [""]).  */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** BPE-ish lexical tokens: letter runs, digit runs, or single non-space
    * symbols — the standard pre-tokenization shape (GPT-2-style) without a
    * vocab. RE2/Java-regex-portable pattern.
    */
  val lexTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def lexTokens(text: Column): Column = regexp_extract_all(text, lit(lexTokenPattern), lit(0))

  /** Word-level sliding shingles of size n (fewer than n tokens → one shingle
    * of the whole token list), for Jaccard/MinHash dedup.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - n + 1),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Distinct character n-grams of the raw text (for near-dup shingling that
    * is robust to word-boundary edits).
    */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) < n, array(text)).otherwise(
      array_distinct(transform(sequence(lit(1), length(text) - n + 1),
        i => text.substr(i, lit(n)))))

  private val stopwordsEn = Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")

  /** Quality metrics over a text column — length, token stats, punctuation and
    * stopword ratios. The standard cheap filters for pretraining corpora.
    */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks)
    val nChars = length(text)
    val punct = length(text) - length(regexp_replace(text, "[.,;:!?'\"()\\[\\]{}-]", ""))
    val stopHits = size(filter(toks, t => t.isin(stopwordsEn: _*)))
    Seq(
      "n_chars" -> nChars.cast("long"),
      "n_tokens" -> nTok.cast("long"),
      "avg_token_len" -> when(nTok === 0, lit(0.0))
        .otherwise(length(regexp_replace(trim(text), "\\s+", "")).cast("double") / nTok),
      "punct_ratio" -> when(nChars === 0, lit(0.0)).otherwise(punct.cast("double") / nChars),
      "stopword_ratio" -> when(nTok === 0, lit(0.0)).otherwise(stopHits.cast("double") / nTok)
    )
  }

  /** Language-marker token sets — tiny per-language stopword profiles. Chosen
    * to be disjoint across languages so scoring is a plain hit count.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein", "eine", "mit", "für"),
    "en" -> Seq("the", "and", "of", "to", "is", "that", "for", "with", "this", "not"),
    "es" -> Seq("el", "la", "los", "las", "es", "una", "para", "por", "como", "pero"),
    "fr" -> Seq("le", "les", "des", "est", "une", "dans", "pour", "que", "pas", "sur")
  )

  /** N-gram/stopword-heuristic language ID: score = marker-token hits per
    * language, plus a Han-script character count routed to "zh"; argmax with
    * deterministic alphabetical tie-break, "und" (undetermined) when no
    * marker hits at all.
    */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val hanCount = length(text) - length(regexp_replace(text, "[\\u4e00-\\u9fa5]", ""))
    val scored: Seq[(String, Column)] =
      langMarkers.map { case (lang, ws) => lang -> size(filter(toks, t => t.isin(ws: _*))) } :+
        ("zh" -> hanCount)
    // argmax with ties to the alphabetically-first language: fold over
    // candidates in reverse-alphabetical order, replacing on >=.
    val best = scored.sortBy(_._1).reverse.foldLeft(lit("und") -> lit(0): (Column, Column)) {
      case ((bl, bs), (lang, s)) => (when(s >= bs && s > 0, lit(lang)).otherwise(bl),
        when(s >= bs, s).otherwise(bs))
    }
    best._1
  }

  /** Order-sensitive document fingerprint (rolling hash, native expression). */
  def fingerprint(text: Column): Column = HashFunctions.doc_fingerprint(text)

  /** Full text-analysis projection over a documents table. */
  def analyze(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val metrics = qualityMetrics(t).map { case (n, c) => c.as(n) }
    docs.select(
      Seq(col(idCol), langId(t).as("lang_pred"), fingerprint(t).as("fingerprint"),
        size(lexTokens(t)).cast("long").as("n_lex_tokens")) ++ metrics: _*)
  }
}
