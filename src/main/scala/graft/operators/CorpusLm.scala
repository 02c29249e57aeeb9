package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Corpus-statistics language modeling for data curation — the two classic
  * count-based selection operators a 100 TB training-data pipeline runs
  * between dedup and packing:
  *
  *  - [[bigramBits]]: CCNet-style quality bucketing (Wenzek et al. 2020,
  *    arXiv:1911.00359 §4.3 — public paper): score every document by its
  *    average per-token bits under an add-α bigram model fit on the corpus
  *    itself, then split each language into head/middle/tail terciles.
  *    CCNet fits KenLM on Wikipedia; with zero egress the corpus is its
  *    own LM here, which keeps the operator's shape (counts → join →
  *    per-doc fold → bucket) while staying deterministic and oracle-able.
  *
  *  - [[dsirWeights]]: Data Selection with Importance Resampling (Xie et
  *    al. 2023, arXiv:2302.03169 §3 — public paper): hashed-unigram bag
  *    features, per-document importance log-weight
  *    Σ_positions ln(p̂_target(f) / p̂_raw(f)) under add-α smoothing over
  *    B hash buckets, then the top-K most target-like documents.
  *
  * Cross-engine exactness discipline (the [[Search.bm25]] contract): every
  * float step shares its operation order with the DuckDB oracle, the only
  * data-dependent float sums are per-document folds in token-position
  * order (never a partition-order-dependent double aggregate), ln agrees
  * between engines (BM25/HLL precedent), and integer-valued doubles are
  * exact below 2^53.
  *
  * Scale shape: all count tables are map-side-combined aggregates keyed by
  * token/bucket; the per-position probability lookup is a keyed equi-join
  * (a corpus-derived bigram table is NOT broadcastable at 100 TB — the
  * shuffle join on (w1, w2) is the intended shape, though AQE may
  * broadcast it at test SF); corpus totals are one-row aggregates joined
  * by literal crossJoin+broadcast; the per-doc reduction is one groupBy.
  * The tercile window partitions by language — bounded cardinality, and at
  * extreme scale the cutoff variant (rank thresholds from the
  * [[Quantile]] sketch, broadcast-joined) replaces ntile; ntile is kept
  * here because it is the exact-oracle form.
  */
object CorpusLm {

  /** (doc_id, pos, w1, w2) bigram instances for docs with ≥ 2 tokens.
    * The token array is staged in a child select below the generator
    * (Project-below-Generate: evaluated once per row, never inlined into
    * the explode — the Frequency.sketch discipline).
    */
  private def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), posexplode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        expr("slice(toks, 2, size(toks) - 1)"),
        (x, y) => struct(x.as("w1"), y.as("w2")))))
      .select(col("doc_id"), col("pos"),
        col("col.w1").as("w1"), col("col.w2").as("w2"))

  /** Per-document average bits under the corpus's own add-α bigram model,
    * bucketed head/middle/tail per language.
    *
    * For each bigram position i: lp_i = ln((c2(w_i-1, w_i) + α) /
    * (c1(w_i-1) + α·V)) with V = |distinct unigrams|; both counts come
    * from the same corpus so c2 ≥ 1 and c1 ≥ 1 for every instance. bits =
    * −(Σ lp_i in position order) / (n · ln 2), r6-rounded. Terciles:
    * ntile(3) over (lang ORDER BY bits, doc_id) → head|middle|tail —
    * CCNet's head/middle/tail split, lowest bits = head (most fluent).
    *
    * Returns (doc_id, lang, n_bigrams, bits, bucket) for docs with ≥ 2
    * tokens.
    */
  def bigramBits(docs: DataFrame, alpha: Double = 0.1): DataFrame = {
    val bg = bigrams(docs)
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).cast("double").as("c1"))
    val c2 = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("double").as("c2"))
    // V counts distinct tokens in EITHER bigram slot == distinct tokens
    // of every ≥2-token doc (every token is a w1 or the final w2) — the
    // direct form explodes n tokens/doc instead of 2(n−1) bigram slots
    // and scans the corpus once, not twice; the VALUE is identical, so
    // the oracle may derive it from the slots
    val vocab = docs
      .select(TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(col("toks")).as("w"))
      .agg(countDistinct("w").cast("double").as("v"))
    val lp = log((col("c2") + lit(alpha)) / (col("c1") + lit(alpha) * col("v")))
    val scored = bg
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), struct(col("pos"), lp.as("lp")).as("plp"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("plp"))).as("plps"))
      .select(col("doc_id"), size(col("plps")).cast("long").as("n_bigrams"),
        aggregate(transform(col("plps"), p => p.getField("lp")),
          lit(0.0), (a, x) => a + x).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        TextAnalysis.r6(-(col("s") / col("n_bigrams").cast("double"))
          / lit(math.log(2.0))).as("bits"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("bits"), col("doc_id"))
    scored.join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("bucket",
        element_at(typedlit(Seq("head", "middle", "tail")), ntile(3).over(w)))
      .select("doc_id", "lang", "n_bigrams", "bits", "bucket")
  }

  /** DSIR importance log-weights over hashed unigram features: weight(d) =
    * Σ_positions [ln(tc(f) + α) − ln(T + α·B) − ln(rc(f) + α) + ln(R + α·B)]
    * where f = sha60("dsir:" ‖ token) mod B, tc/rc are target/raw bucket
    * counts, T/R the corpus token totals — the add-α smoothed bag-of-
    * hashed-unigrams log-likelihood ratio of §3 of the paper. The target
    * distribution is the rows matching `isTarget` (a curated slice, e.g.
    * a known-good source set); raw is the whole corpus. Every token has
    * rc ≥ 1 (raw covers the corpus) but tc may be 0 — the left join +
    * coalesce is load-bearing. The fold is in token-position order.
    *
    * Returns the `topK` most target-like docs:
    * (doc_id, n_toks, weight r6-rounded), ranked by raw weight with
    * doc_id tie-break (TakeOrderedAndProject — never a global sort).
    */
  def dsirWeights(docs: DataFrame, isTarget: Column, buckets: Int = 8192,
      alpha: Double = 0.5, topK: Int = 100): DataFrame = {
    val toks = docs
      .select(col("doc_id"), isTarget.as("tgt"),
        TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), col("tgt"), posexplode(col("toks")))
      .select(col("doc_id"), col("tgt"), col("pos"),
        (Hashing.sha60(concat(lit("dsir:"), col("col"))) % buckets).as("f"))
    val rc = toks.groupBy("f").agg(
      count(lit(1)).cast("double").as("rc"),
      sum(when(col("tgt"), 1L).otherwise(0L)).cast("double").as("tc"))
    val totals = toks.agg(
      count(lit(1)).cast("double").as("rt"),
      sum(when(col("tgt"), 1L).otherwise(0L)).cast("double").as("tt"))
    val ab = lit(alpha * buckets)
    val lp = log(col("tc") + lit(alpha)) - log(col("tt") + ab) -
      (log(col("rc") + lit(alpha)) - log(col("rt") + ab))
    toks.join(rc, Seq("f"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), struct(col("pos"), lp.as("lp")).as("plp"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("plp"))).as("plps"))
      .select(col("doc_id"), size(col("plps")).cast("long").as("n_toks"),
        aggregate(transform(col("plps"), p => p.getField("lp")),
          lit(0.0), (a, x) => a + x).as("w_raw"))
      .orderBy(col("w_raw").desc, col("doc_id")).limit(topK)
      .select(col("doc_id"), col("n_toks"),
        TextAnalysis.r6(col("w_raw")).as("weight"))
  }
}
