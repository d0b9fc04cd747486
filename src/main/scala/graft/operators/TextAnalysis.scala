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

  /** Characters of normalized text (lowercased, whitespace collapsed to one
    * space, trimmed) — feed to `hashed_shingles` for character n-gram
    * Jaccard, the near-dup form that works on whitespace-poor scripts.
    * Empty text → empty array (split("", "") would yield [""]).
    */
  def chars(text: Column): Column = {
    val norm = normChars(text)
    when(length(norm) === 0, array().cast("array<string>"))
      .otherwise(split(norm, ""))
  }

  /** The normalization [[chars]] applies before splitting — exposed so a
    * length predicate can be written against the normalized STRING
    * (`length(normChars(t))` == `size(chars(t))` by construction) without
    * materializing the char array just to count it.
    */
  def normChars(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** BPE-ish lexical tokens: letter runs, digit runs, or single non-space
    * symbols — the standard pre-tokenization shape (GPT-2-style) without a
    * vocab. RE2/Java-regex-portable pattern.
    */
  val lexTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def lexTokens(text: Column): Column = regexp_extract_all(text, lit(lexTokenPattern), lit(0))

  /** Word-level sliding shingles of size n (fewer than n tokens → one shingle
    * of the whole token list), for Jaccard/MinHash dedup.
    *
    * IMPORTANT: `toks` must be a materialized column (attribute), not an
    * inline expression — expressions referenced inside a higher-order
    * `transform` lambda are re-evaluated per element, turning an inline
    * tokenizer into O(tokens²) per document (measured 8s vs 0.3s on 5k docs).
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - n + 1),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Hashed shingles from a materialized per-token-hash column: shingle
    * identity = xxhash64 of the n-token hash window; the shingle string is
    * never built. Pair with a materialized `transform(toks, xxhash64)` column.
    */
  def hashedShinglesFromTokenHashes(toks: Column, tokH: Column, n: Int): Column =
    when(size(toks) < n, array(xxhash64(concat_ws(" ", toks))))
      .otherwise(transform(sequence(lit(1), size(toks) - n + 1),
        i => xxhash64(slice(tokH, i, lit(n)))))

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
    *
    * Scoring is ONE native pass over the text
    * ([[graft.functions.LangScores]]): the compositional form re-tokenized
    * the text once per language plus a regex replace for the Han count —
    * 5× the map cost, which is the whole cost of this operator at corpus
    * scale. Argmax stays array-based — NOT a when/otherwise fold, which
    * duplicates every score subtree per step (2^n expression blowup; the
    * same pathology as the IVF argmin, measured 3s+ on 5k docs).
    */
  def langId(text: Column): Column = {
    val ordered = langMarkers.sortBy(_._1) // alphabetical; "zh" sorts last
    val scores = graft.functions.TextFunctions.lang_scores(text, ordered.map(_._2))
    val names = array((ordered.map(_._1) :+ "zh").map(lit): _*)
    val m = array_max(scores)
    when(m <= 0, lit("und"))
      .otherwise(element_at(names, array_position(scores, m).cast("int")))
  }

  /** Order-sensitive document fingerprint (rolling hash, native expression). */
  def fingerprint(text: Column): Column = HashFunctions.doc_fingerprint(text)

  /** TF-IDF over a documents table: one row per (doc, term) with term
    * frequency, document frequency, and tf·idf (ln-idf, the classic
    * `tf * ln(N / df)` form).
    *
    * Scale shape: one explode of distinct-terms-per-doc (the posting list),
    * one partial-aggregated groupBy for df, one broadcast of the (tiny)
    * term→df map back onto the postings. The corpus-size N is a scalar
    * cross-join literal, not a driver collect.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"), tokens(lower(col(textCol))).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n_doc_tokens"),
        explode(col("toks")).as("term"))
    // NOT cached: tf feeds both the df aggregation and the final join, but
    // the wide (doc_id, term) frame is the largest in the job — persisting it
    // costs more to write than the map-only tokenize recompute it saves
    // (measured 0.95s without vs 4.35s with, sf0.1). Same rule as the
    // Jaccard/MinHash wide frames: cache only narrow derived frames.
    val tf = terms.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first(col("n_doc_tokens")).as("n_doc_tokens"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col(idCol)).as("n_docs"))
    tf.join(broadcast(df), "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6).as("tf_idf"))
  }

  /** Split documents into fixed-size token windows with stride (the chunking
    * step an embedding/training pipeline runs before vectorizing long docs).
    * Chunk i covers tokens [i·stride + 1, i·stride + size]; the start walk
    * STOPS at the first window that reaches the document end, so every token
    * lands in ≥1 chunk, the last chunk may be short, and no chunk is a pure
    * suffix of its predecessor (a start within size−stride of the end would
    * re-emit already-covered tokens — duplication a training-prep chunker
    * exists to avoid). Empty docs yield no chunks.
    *
    * Shape: the token array is materialized ONCE per row in a projection
    * BELOW the Generate (explode) node — an attribute crossing the generator
    * boundary can't be inlined back into the per-chunk expressions, so the
    * tokenize never re-runs per chunk (the HOF-lambda re-eval trap). Chunk
    * rows are map-side only: no shuffle at all.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int, carryCols: Seq[String] = Nil): DataFrame = {
    require(size >= 1 && stride >= 1 && stride <= size,
      "need size >= stride >= 1 (stride > size would drop tokens)")
    // carryCols ride along unchanged (each chunk derives from exactly one
    // input row) — how the interpreter keeps the record key through the
    // row-replacing projection without changing its value or type
    val carry = carryCols.map(col)
    val t = docs
      .select(col(idCol) +: carry :+ tokens(col(textCol)).as("__toks"): _*)
      .withColumn("__n", org.apache.spark.sql.functions.size(col("__toks")))
      .filter(col("__n") > 0)
    // last start = ceil((n - size) / stride), floored at 0: the first i with
    // i*stride + size >= n
    val lastStart = greatest(lit(0),
      floor((col("__n") - size + stride - 1) / stride)).cast("int")
    t.select(col(idCol) +: carry ++: Seq(
        explode(sequence(lit(0), lastStart)).as("chunk_id"),
        col("__toks"), col("__n")): _*)
      .select(col(idCol) +: carry ++: Seq(col("chunk_id"),
        array_join(slice(col("__toks"), col("chunk_id") * stride + 1, lit(size)), " ")
          .as("chunk"),
        // arithmetic, not a second slice: the window is full-size except the
        // last, which holds the n − i·stride remaining tokens
        least(lit(size), col("__n") - col("chunk_id") * stride).as("n_chunk_tokens")): _*)
  }

  /** Deterministic stratified subsample: keep every `interval`-th row per
    * stratum in a stable id order — the reproducible (seedless, engine-
    * independent) form of proportional downsampling a training-data pipeline
    * uses for class balancing. For hash-based sampling at scale prefer
    * `pmod(xxhash64(id), n) < k` (no window); the window form is exact-count
    * per stratum, which matters for small strata.
    */
  def stratifiedSample(df: DataFrame, stratumCols: Seq[String], idCol: String,
      interval: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter((col("__rn") - 1) % interval === 0)
      .drop("__rn")
  }

  /** Deterministic weighted source-mix sampling: keep fraction w_s of each
    * stratum (training-mixture reweighting — "2 parts web, 1 part news,
    * 0.1 part everything else"). Row r of a stratum survives iff
    * floor(r·w) > floor((r−1)·w) in stable id order, which keeps exactly
    * ⌊n·w⌋±1 rows per stratum, evenly spread, with no seed and no RNG —
    * rerunnable and engine-independent (the DuckDB oracle replays the same
    * arithmetic). Weights outside [0,1] are rejected; unlisted strata get
    * `defaultWeight`. Same scale note as [[stratifiedSample]]: the
    * row_number window is one exchange partitioned by stratum — exact
    * counts for modest strata; for billions-per-stratum prefer the
    * hash-threshold form (`pmod(xxhash64(id), 10000) < w*10000`, no
    * window) and accept binomial jitter.
    */
  def weightedMix(df: DataFrame, stratumCol: String, idCol: String,
      weights: Map[String, Double], defaultWeight: Double = 0.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 1),
      "mix weights must be fractions in [0, 1]")
    val mapArgs = weights.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    val frac = coalesce(element_at(map(mapArgs: _*), col(stratumCol)),
      lit(defaultWeight))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w).cast("double"))
      .filter(floor(col("__rn") * frac) > floor((col("__rn") - 1) * frac))
      .drop("__rn")
  }

  /** Benchmark-contamination check: for every corpus document, the fraction
    * of its distinct word shingles that also occur anywhere in the
    * benchmark set — the standard eval-leakage screen run before training.
    * Shape at 100 TB: the benchmark is eval-set-sized, so its distinct
    * shingle hashes BROADCAST; the corpus explodes to fixed-width
    * (id, n, hash) posting rows, the semi join against the broadcast set is
    * map-side, and the only exchange is the per-doc match count — corpus
    * text never crosses the wire. Shingle identity is the same 64-bit
    * composed hash the near-dup operators use (collision odds
    * |shingles|²/2⁶⁵ — negligible).
    *
    * Returns (idCol, n_shingles, matched, contamination) for EVERY corpus
    * doc, zero-matched included — thresholding is the caller's policy (a
    * `filter(col("contamination") > t)`), not baked in.
    */
  def contamination(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, shingleSize: Int): DataFrame = {
    val dSh = docs.select(col(idCol),
      HashFunctions.hashed_shingles(tokens(col(textCol)), shingleSize).as("sh"))
      .withColumn("n_shingles", size(col("sh")))
    val bSh = bench.select(
        explode(HashFunctions.hashed_shingles(tokens(col(textCol)), shingleSize)).as("h"))
      .distinct()
    val matched = dSh.select(col(idCol), explode(col("sh")).as("h"))
      .join(broadcast(bSh), Seq("h"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("matched"))
    // shingle arrays are distinct by construction, so the semi-joined
    // posting count IS the distinct-overlap count; n_shingles >= 1 always
    // (short docs collapse to one whole-text shingle), so the ratio is safe
    dSh.select(col(idCol), col("n_shingles"))
      .join(matched, Seq(idCol), "left_outer")
      .withColumn("matched", coalesce(col("matched"), lit(0L)))
      .withColumn("contamination",
        round(col("matched").cast("double") / col("n_shingles"), 6))
  }

  /** The benchmark set compiled to its distinct shingle hashes — the
    * driver-side half of [[contaminationStream]]. A bounded collect by
    * construction: benchmarks are eval-set-sized (thousands of docs, ≲1M
    * shingles = 8 MB), never corpus-sized; the corpus side stays fully
    * distributed.
    */
  def benchShingleHashes(bench: DataFrame, textCol: String,
      shingleSize: Int): Array[Long] =
    bench.select(explode(
        HashFunctions.hashed_shingles(tokens(col(textCol)), shingleSize)).as("h"))
      .distinct().collect().map(_.getLong(0))

  /** Streaming-capable contamination screen: identical scores to
    * [[contamination]], computed as a PURE PROJECTION — the benchmark's
    * hashes ride into every task as one sorted reference array
    * (`set_overlap_count`, binary search per shingle), so there is no join
    * and no aggregation. That makes it legal in any streaming output mode
    * and watermark-free (stateless), and in batch it trades
    * [[contamination]]'s count exchange for zero shuffles — preferable
    * whenever the benchmark is small enough to collect, which eval sets
    * are by definition.
    */
  def contaminationStream(docs: DataFrame, benchHashes: Array[Long],
      idCol: String, textCol: String, shingleSize: Int,
      carryCols: Seq[String] = Nil): DataFrame =
    docs.select(col(idCol) +: carryCols.map(col) :+
        HashFunctions.hashed_shingles(tokens(col(textCol)), shingleSize).as("__sh"): _*)
      .withColumn("n_shingles", size(col("__sh")))
      .withColumn("matched",
        HashFunctions.set_overlap_count(col("__sh"), benchHashes.toSeq).cast("long"))
      .withColumn("contamination",
        round(col("matched").cast("double") / col("n_shingles"), 6))
      .drop("__sh")

  /** PII redaction rules, applied in order: email first (an address's local
    * part would otherwise partially match the digit-run patterns), then
    * phone (requires a leading `+` so bare ids/names are never eaten), then
    * IPv4, then SSN-shaped digit groups. Patterns stay in the portable
    * regex subset (no lookaround) so the same strings run under Java regex
    * and RE2-family engines — which is also what makes the DuckDB oracle
    * able to mirror the transform exactly.
    */
  val PiiRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    "\\+[0-9][0-9 ().-]{6,}[0-9]" -> "[PHONE]",
    "([0-9]{1,3}\\.){3}[0-9]{1,3}" -> "[IP]",
    "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b" -> "[SSN]")

  /** Redact PII-shaped spans in a text column (X22). Pure chained
    * `regexp_replace` — map-only, codegen'd, zero shuffle at any corpus
    * size; the scrub a pretraining pipeline runs on every document.
    */
  def redactPii(text: Column, rules: Seq[(String, String)] = PiiRules): Column =
    rules.foldLeft(text) { case (c, (pat, token)) => regexp_replace(c, pat, token) }

  /** Within-document repetition metrics (X23) — the Gopher-style quality
    * signals for machine-generated/boilerplate text: duplicate-word
    * fraction (1 − distinct/total) and the fraction of the doc taken by
    * its single most frequent word and bigram. ZERO shuffle: the stats
    * are per-document, so they are computed per row — the most-frequent
    * counts come from a sort + max-run-length fold over the doc's own
    * token/bigram arrays (`aggregate` HOF), never an explode + groupBy
    * exchange over the corpus. Empty docs score 0 everywhere.
    */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // max run length over a SORTED array == max element frequency
    def maxRun(sorted: Column): Column = {
      val folded = aggregate(sorted,
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        })
      folded.getField("best")
    }
    def frac(num: Column, den: Column): Column =
      when(den === 0, lit(0.0)).otherwise(round(num.cast("double") / den, 6))
    docs
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("__bi",
        when(size(col("__toks")) < 2, array().cast("array<string>"))
          .otherwise(zip_with(
            slice(col("__toks"), lit(1), size(col("__toks")) - 1),
            slice(col("__toks"), lit(2), size(col("__toks")) - 1),
            (a, b) => concat_ws(" ", a, b))))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_words"),
        frac(size(col("__toks")) - size(array_distinct(col("__toks"))),
          size(col("__toks"))).as("dup_word_frac"),
        frac(when(size(col("__toks")) === 0, 0L)
            .otherwise(maxRun(array_sort(col("__toks")))),
          size(col("__toks"))).as("top_word_frac"),
        frac(when(size(col("__bi")) === 0, 0L)
            .otherwise(maxRun(array_sort(col("__bi")))),
          size(col("__bi"))).as("top_bigram_frac"))
  }

  /** Full text-analysis projection over a documents table. */
  def analyze(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val metrics = qualityMetrics(t).map { case (n, c) => c.as(n) }
    docs.select(
      Seq(col(idCol), langId(t).as("lang_pred"), fingerprint(t).as("fingerprint"),
        size(lexTokens(t)).cast("long").as("n_lex_tokens")) ++ metrics: _*)
  }
}
