package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-distribution drift statistics — the data-card facets that tell a
  * mixing recipe WHEN to change, next to q_source_report's composition
  * snapshot (what each source holds) and the duplication matrix (how the
  * sources overlap).
  *
  * Reference role: the corpus-grain analogue of the collector's per-sink
  * delivered/filtered counters (cmd/freader/metrics/metrics.go:24-70) —
  * accounting that detects a source changing shape, re-expressed over token
  * distributions instead of record counts.
  */
object Drift {

  /** Total variation distance of each source's token distribution from the
    * corpus-wide distribution: `TVD(s) = ½ Σ_w |c_s(w)/N_s − C(w)/N|` —
    * the standard "is this source distributionally unusual" statistic, and
    * the exact-arithmetic member of the divergence family (KL/JS need
    * logarithms, whose doubles are not hash-comparable cross-engine).
    *
    * Exactness: the sum is computed over INTEGER cross-products,
    * `Σ_w |c_s(w)·N − C(w)·N_s|`, split into the words the source carries
    * (a join against corpus counts) plus a closed form for the words it
    * does not: `N_s·(N − Σ_{w∈s} C(w))`. Only the final ratio touches
    * floating point (numerator < 2·N_s·N, exact in a double far beyond
    * these scale factors), then [[TextAnalysis.r6]].
    *
    * Scale shape: token counts are two map-side-combined aggregates (one
    * keyed (source, word), one keyed word); the word-keyed join carries
    * count rows only — never text; per-source totals are a broadcast-sized
    * dimension (≤ |sources| rows). NO grid of sources × vocabulary is ever
    * materialized — that is the oracle's independent (small-scale-only)
    * derivation. Sizing rule: int64 products need `max(c_s(w))·N < 2^63`;
    * past ~10^9 corpus tokens route the two products through decimal(38,0).
    */
  def tvdVsCorpus(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("source"),
      explode(TextAnalysis.tokens(col("text"))).as("word"))
    val sc = tok.groupBy("source", "word").agg(count(lit(1)).as("c"))
    val cc = tok.groupBy("word").agg(count(lit(1)).as("cw"))
    val ns = sc.groupBy("source").agg(sum("c").as("n_s"),
      count(lit(1)).as("n_vocab"))
    val tot = cc.agg(sum("cw").as("n_total"))
    sc.join(cc, "word")
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(tot))
      .groupBy("source")
      .agg(
        max("n_s").as("n_tokens"), max("n_vocab").as("n_vocab"),
        max("n_total").as("n_total"),
        sum(abs(col("c") * col("n_total") - col("cw") * col("n_s")))
          .as("num_present"),
        sum("cw").as("cov"))
      .select(col("source"), col("n_tokens"), col("n_vocab"),
        TextAnalysis.r6(
          (col("num_present") + col("n_tokens") * (col("n_total") - col("cov")))
            / (lit(2.0) * col("n_tokens") * col("n_total"))).as("tvd"))
  }

  /** Per-source KL divergence from the corpus unigram mix,
    * KL(P_s ‖ P_corpus) = Σ_w p_s(w) · ln(p_s(w) / p_c(w)) — the
    * log-scale sibling of [[tvdVsCorpus]] (TVD weighs mass moved; KL
    * weighs surprise, the quantity a perplexity-driven mixing recipe
    * actually reasons about). Absent words contribute 0 (p_s = 0 and
    * 0·ln 0 = 0) and every present word has corpus support (c ≤ cw), so
    * no smoothing is needed: the sum runs over the source's own vocab.
    *
    * Float discipline — the ORDER-FREE alternative to the ordered fold:
    * each per-word term (c/n_s)·ln((c·N)/(cw·n_s)) is micro-truncated to
    * an exact integer (floor(term·1e6 + 0.5), negative terms floor
    * deterministically in both engines), and the per-source SUM is an
    * integer aggregate — commutative, partition-order-immune, map-side
    * combinable. kl re-scales the micro sum. This is the q_source_report
    * quality_micros discipline applied to a log-scale statistic, and it
    * is what keeps the aggregate bounded-state at 100 TB (an ordered
    * fold would collect a source's whole vocabulary into one row).
    *
    * Returns (source, n_tokens, n_vocab, kl_micros, kl).
    */
  def klVsCorpus(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("source"),
      explode(TextAnalysis.tokens(col("text"))).as("word"))
    val sc = tok.groupBy("source", "word").agg(count(lit(1)).as("c"))
    val cc = tok.groupBy("word").agg(count(lit(1)).as("cw"))
    val ns = sc.groupBy("source").agg(sum("c").as("n_s"),
      count(lit(1)).as("n_vocab"))
    val tot = cc.agg(sum("cw").as("n_total"))
    val term = (col("c").cast("double") / col("n_s").cast("double")) *
      log((col("c").cast("double") * col("n_total").cast("double")) /
        (col("cw").cast("double") * col("n_s").cast("double")))
    sc.join(cc, "word")
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_s"), col("n_vocab"),
        floor(term * 1000000.0 + 0.5).cast("long").as("tm"))
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"), max("n_vocab").as("n_vocab"),
        sum("tm").as("kl_micros"))
      .select(col("source"), col("n_tokens"), col("n_vocab"),
        col("kl_micros"),
        (col("kl_micros").cast("double") / lit(1000000.0)).as("kl"))
  }

  /** Vocabulary growth curve across ordered corpus batches (the Heaps'-law
    * face of corpus accounting): per batch, its token volume, within-batch
    * distinct tokens, tokens FIRST seen in that batch, and the cumulative
    * vocabulary — the "is new data still bringing new language" signal a
    * crawl-scheduling loop reads, and the direct empirical input to sizing
    * the CMS/HLL sketches (q_freq_sketch / q_cardinality_sketch).
    *
    * Scale shape: per-batch counts map-side combine; first-seen is ONE
    * shuffle on the token (min-batch aggregate — never a batch×batch
    * comparison, which is the oracle's independent NOT-EXISTS derivation);
    * the cumulative window runs over exactly `nBatches` rows, so its
    * single-partition stage is bounded by the batch count, not the data.
    */
  def vocabGrowth(docs: DataFrame, nBatches: Int): DataFrame = {
    val tok = docs.select((col("doc_id") % nBatches).as("batch"),
      explode(TextAnalysis.tokens(col("text"))).as("word"))
    val per = tok.groupBy("batch").agg(count(lit(1)).as("n_tokens"),
      countDistinct(col("word")).as("n_distinct"))
    val news = tok.groupBy("word").agg(min("batch").as("batch"))
      .groupBy("batch").agg(count(lit(1)).as("n_new"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("batch")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    per.join(news, Seq("batch"), "left")
      .select(col("batch"), col("n_tokens"), col("n_distinct"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("vocab_cum", sum("n_new").over(w))
  }

  /** Corpus diff between two snapshots by (id, content-hash): per document,
    * `added` (only in B), `removed` (only in A), `changed` (both, different
    * sha60), `unchanged` — the corpus-grain twin of the reference's
    * open-time fingerprint reverify (file_tracker.go decides reprocess vs
    * resume from exactly this comparison, one file at a time). One shuffle
    * per side on the id; hashes are 8 bytes, text never crosses the wire.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def hashed(df: DataFrame, tag: String): DataFrame =
      df.select(col(idCol).as("doc_id"),
        graft.functions.Hashing.sha60(col(textCol)).as(s"h_$tag"))
    hashed(a, "a").join(hashed(b, "b"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_a").isNull, lit("added"))
          .when(col("h_b").isNull, lit("removed"))
          .when(col("h_a") =!= col("h_b"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
