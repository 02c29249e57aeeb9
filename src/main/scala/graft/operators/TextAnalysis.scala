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
}
