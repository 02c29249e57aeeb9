package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis stages for a training-data pipeline over a `text` column:
  * tokenization, language ID, quality scoring, token counting, document
  * fingerprinting. All pure column expressions (whole-stage codegen; no
  * UDFs), so they survive a 100× scale-up untouched.
  */
object TextAnalysis {

  /** Whitespace tokenization of lowercased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Cross-engine-stable 6dp rounding: floor(x·1e6 + 0.5)/1e6 evaluates to
    * the identical double in any IEEE-754 engine given the same input —
    * unlike round(x, 6), where Spark (decimal-string HALF_UP) and DuckDB
    * (binary scaling) disagree on decimal ties like 0.5203125.
    */
  def r6(c: Column): Column = floor(c * 1000000.0 + 0.5) / 1000000.0

  /** Word n-gram shingles as strings: slice windows over the token array.
    * Documents shorter than n yield an empty array.
    */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => array_join(slice(t, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  // --------------------------------------------------------------- language id

  /** Tiny per-language stopword tables (n-gram heuristic stand-in). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "una", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "这", "人"))

  /** Per-language stopword hit count: number of tokens present in the
    * language's stopword list (counting duplicates — exact, not distinct).
    */
  def langScore(text: Column, lang: String): Column = {
    val set = stopwords.toMap.apply(lang)
    size(filter(tokens(text), t => t.isin(set: _*)))
  }

  /** Predicted language: argmax of stopword hits with deterministic
    * priority order (en > es > de > fr > zh); all-zero ⇒ 'unknown'.
    */
  def langId(text: Column): Column = {
    val scores = stopwords.map { case (l, _) => l -> langScore(text, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // foldRight nests the whens en-first, so earlier languages win ties
    scores.foldRight(lit("unknown"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  // --------------------------------------------------------------- quality

  /** Quality heuristics: length, token count, mean token length,
    * punctuation ratio, stopword ratio, and a composite [0,1] score.
    * Ratios are rounded to 6dp for cross-engine comparability.
    */
  def quality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val t = tokens(text)
    val nChars = length(text)
    val nTokens = size(t)
    val punct = length(regexp_replace(text, "[^.!?,;:]", ""))
    val stopHits = langScore(text, "en")
    df.withColumn("n_chars_m", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("mean_token_len",
        r6(when(nTokens > 0, (nChars - (nTokens - 1)).cast("double") / nTokens)
          .otherwise(lit(0.0))))
      .withColumn("punct_ratio",
        r6(when(nChars > 0, punct.cast("double") / nChars).otherwise(lit(0.0))))
      .withColumn("stopword_ratio",
        r6(when(nTokens > 0, stopHits.cast("double") / nTokens).otherwise(lit(0.0))))
      .withColumn("quality_score", r6(
        when(nTokens === 0, lit(0.0)).otherwise(
          least(lit(1.0), nTokens.cast("double") / 64) * 0.5
            + least(lit(1.0), col("stopword_ratio") * 4) * 0.3
            + (lit(1.0) - least(lit(1.0), col("punct_ratio") * 5)) * 0.2)))
  }

  /** Token count: whitespace tokens plus a BPE-ish subword estimate
    * (words are ~4 chars/token under common BPE vocabularies).
    */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    df.withColumn("ws_tokens", when(length(trim(text)) === 0, 0)
        .otherwise(size(split(trim(text), "\\s+"))))
      .withColumn("bpe_est_tokens",
        greatest(col("ws_tokens"), ceil(length(text).cast("double") / 4).cast("int")))
  }

  /** Document fingerprint: minimum sha256 over word 5-gram shingles —
    * a deterministic, order-invariant content signature (rolling-hash
    * analogue; stable under whitespace-preserving reorder of equal docs).
    */
  def docFingerprint(text: Column, n: Int = 5): Column =
    array_min(transform(shingles(text, n), s => sha2(s, 256)))

  // ------------------------------------------------------- repetition filters

  /** Gopher-style repetition statistics (Rae et al. 2021 §A1.1) over a
    * text column:
    *   - `dup_line_frac`: fraction of fixed 10-token "lines" that repeat an
    *     earlier line (the corpus here is single-line, so lines are token
    *     windows — the boundary discipline is what matters);
    *   - `top_bigram_frac`: share of all word bigrams taken by the most
    *     frequent one.
    * Line stats are pure per-row expressions. The bigram mode genuinely
    * needs a count per (id, bigram): one map-side-combinable aggregate
    * keyed by the doc id plus a per-id max — both shuffles carry only
    * (id, bigram, count), never document text, and the final join is
    * id-to-id on co-partitioned aggregates. That is the 100 TB shape for
    * a mode computation; a per-row O(n²) higher-order-function scan would
    * burn quadratic CPU per long document instead.
    */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // token array staged through a Generate barrier: the line and bigram
    // lambdas below reference it, and an ALIASED tokens expression would be
    // inlined by CollapseProject and the regex split re-evaluated once per
    // line window / bigram (measured 1.45s → 0.35s for this operator at
    // sf0.1 inside q_curate_full); a Generate output attribute is evaluated
    // once per row and projections never merge across Generate
    val staged = df.select(col(idCol),
      explode(array(tokens(col(textCol)))).as("w"))
    val words = col("w")
    val nLines = ceil(size(words) / 10.0).cast("long")
    val lines = transform(sequence(lit(0L), nLines - 1),
      j => array_join(slice(words, (j * 10 + 1).cast("int"), lit(10)), " "))
    val base = staged.select(col(idCol), words, nLines.as("n_lines"),
      size(array_distinct(lines)).cast("long").as("n_uniq_lines"))
    val bigrams = when(size(col("w")) >= 2,
      transform(sequence(lit(1), size(col("w")) - 1),
        i => concat(element_at(col("w"), i), lit(" "), element_at(col("w"), i + 1))))
      .otherwise(array().cast("array<string>"))
    val top = base.select(col(idCol), explode(bigrams).as("bg"))
      .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max("c").as("top_c"), sum("c").as("n_bg"))
    base.select(col(idCol), col("n_lines"),
        r6((col("n_lines") - col("n_uniq_lines")).cast("double") / col("n_lines"))
          .as("dup_line_frac"))
      .join(top, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"), col("dup_line_frac"),
        r6(coalesce(col("top_c").cast("double") / col("n_bg"), lit(0.0)))
          .as("top_bigram_frac"))
  }

  // ----------------------------------------------------------------- pii scrub

  /** PII regex families. Chosen to mean the same thing under Java regex
    * (Spark) and RE2 (DuckDB): no lookaround, no backreferences, ASCII
    * word boundaries only.
    */
  val emailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phoneRe: String = "\\b\\d{3}-\\d{4}\\b"

  /** PII redaction: replace emails / IPv4s / phone-shaped tokens with typed
    * placeholder tags and count each family (counts are per family over the
    * ORIGINAL text; replacement order email → ip → phone keeps the families
    * non-overlapping). Pure per-row expressions — embarrassingly parallel,
    * no shuffle, survives any scale-up untouched.
    */
  def piiScrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_email", regexp_count(t, lit(emailRe)).cast("int"))
      .withColumn("n_ip", regexp_count(t, lit(ipv4Re)).cast("int"))
      .withColumn("n_phone", regexp_count(t, lit(phoneRe)).cast("int"))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(regexp_replace(t,
          emailRe, "<EMAIL>"), ipv4Re, "<IP>"), phoneRe, "<PHONE>"))
  }

  // ------------------------------------------------------- sliding-window chunks

  /** Sliding-window chunking: given a token-count column `nCol`, emit one
    * row per (doc, chunk) for windows of `window` tokens advancing by
    * `stride` (< window ⇒ overlapping context windows, the RAG/eval
    * chunking discipline). Chunk count is closed-form — explode of a
    * per-row sequence, no shuffle, no state.
    */
  def chunkWindows(df: DataFrame, idCol: String, nCol: String,
      window: Long, stride: Long): DataFrame = {
    val n = col(nCol)
    val nChunks = when(n <= window, lit(1L))
      .otherwise(floor((n - (window - stride + 1)) / stride.toDouble).cast("long") + 1)
    df.select(col(idCol), n.as("n"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        least(col("chunk_id") * stride + window, col("n")).as("end_tok"))
      .withColumn("n_tok", col("end_tok") - col("start_tok"))
  }
}
