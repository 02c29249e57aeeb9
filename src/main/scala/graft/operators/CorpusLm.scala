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
  * 8-byte hashes of the token / pair / bucket (row-scale exchanges never
  * carry text — xxhash64 where the key is engine-internal, the sha60
  * kernel where the oracle must re-derive it); the per-position
  * probability lookup is a keyed equi-join (a corpus-derived bigram table
  * is NOT broadcastable at 100 TB — the shuffle join on the pair hash is
  * the intended shape, though AQE may broadcast it at test SF); corpus
  * totals are one-row aggregates joined
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
    // the bigram instances are ROW-SCALE: hash both join keys to 8 bytes
    // before any exchange (the dedup-family "never shuffle text"
    // discipline) — the w1-slot key and the (w1, w2) pair key each become
    // one hash, so the two count aggregates and the two probability joins
    // move integers only. The key BITS never surface (the oracle
    // re-derives lp from string-keyed counts), so the cross-engine sha60
    // kernel is not required and codegen'd xxhash64 wins (a sha60 version
    // of these keys measured 2× the whole query). The accepted risk is
    // sharper than for purely internal join keys, though: a 64-bit
    // collision would MERGE two counts on the Spark side only and shift
    // lp/bits away from the string-keyed oracle — a correctness
    // divergence, not just noise. Odds are ~|bigrams|²/2^64 (birthday
    // bound ~2^-20 even at 10^11 distinct bigrams) and the oracle gate
    // verifies the shipped corpora exactly; a corpus past that scale
    // should gate this path on sha60-style wider keys instead. The lit
    // salts keep the two key spaces disjoint and multi-arg xxhash64
    // hashes fields positionally, so no separator is needed.
    // cached: the hashed bigram-instance table feeds the c1 aggregate, the
    // c2 aggregate AND the probability-join probe side — uncached, the
    // tokenize + explode + hash pass ran three times (~0.45s each at
    // sf0.1). The cached rows are four longs wide (never strings — the
    // working-notes caveat about string-heavy caches doesn't apply).
    val bg = bigrams(docs).select(col("doc_id"), col("pos"),
      xxhash64(lit("u"), col("w1")).as("h1"),
      xxhash64(lit("b"), col("w1"), col("w2")).as("h12"))
      .cache()
    val c1 = bg.groupBy(col("h1")).agg(count(lit(1)).cast("double").as("c1"))
    val c2 = bg.groupBy(col("h12"))
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
      .join(c2, Seq("h12"))
      .join(c1, Seq("h1"))
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
    // Terciles WITHOUT a full-stratum window: ntile(3) OVER (PARTITION BY
    // lang ORDER BY bits, doc_id) funnels an entire language stratum
    // through one task (the r6-flagged 100 TB straggler). The exact
    // equivalent in two phases: bucket rows by the coarse monotone key
    // floor(bits), take per-(lang, bucket) counts (a model-sized table),
    // turn them into running offsets with a window over THAT table (tens
    // of rows per lang, never row-scale), and add a within-bucket
    // row_number — offset + local rank IS the stratum-global rank because
    // the bucket key is monotone in the sort key and ties in bits share a
    // bucket. The ntile value is then computed arithmetically from
    // (rank, n): k tiles of n rows = n%k tiles of size n/k+1 first, the
    // rest n/k — bit-identical to ntile(3) for every n (CorpusLmSpec pins
    // the equivalence; the oracle still uses SQL ntile). Each window task
    // now holds one (lang, unit-of-bits) slice instead of a language.
    val withLang = scored.join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("__fb", floor(col("bits")))
    val bucketCounts = withLang.groupBy(col("lang"), col("__fb"))
      .agg(count(lit(1)).as("__c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("__fb")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = bucketCounts
      .withColumn("__off", coalesce(sum(col("__c")).over(wCum), lit(0L)))
      .select(col("lang"), col("__fb"), col("__off"))
    val totals = bucketCounts.groupBy(col("lang"))
      .agg(sum(col("__c")).as("__n"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("__fb")).orderBy(col("bits"), col("doc_id"))
    // integer `div` throughout (Column `/` is true division; a double
    // quotient's floor can misround at scale); ANSI-safe: the ELSE branch
    // (divisor `__n div 3`) is only evaluated when the CASE condition is
    // false, which requires __n >= 3
    val tileSql =
      """CASE WHEN __rank <= ((__n div 3) + 1) * (__n % 3)
        |     THEN ((__rank - 1) div ((__n div 3) + 1)) + 1
        |     ELSE (__n % 3) +
        |          ((__rank - 1 - ((__n div 3) + 1) * (__n % 3)) div (__n div 3)) + 1
        |END""".stripMargin
    withLang
      .join(broadcast(offsets), Seq("lang", "__fb"))
      .join(broadcast(totals), Seq("lang"))
      .withColumn("__rank", col("__off") + row_number().over(wIn))
      .withColumn("bucket",
        element_at(typedlit(Seq("head", "middle", "tail")),
          expr(tileSql).cast("int")))
      .select("doc_id", "lang", "n_bigrams", "bits", "bucket")
  }

  /** DSIR importance log-weights over hashed unigram features: weight(d) =
    * Σ_positions [ln(tc(f) + α) − ln(T + α·B) − ln(rc(f) + α) + ln(R + α·B)]
    * where f = sha60("dsir:" ‖ token) mod B, tc/rc are target/raw bucket
    * counts, T/R the corpus token totals — the add-α smoothed bag-of-
    * hashed-unigrams log-likelihood ratio of §3 of the paper. The target
    * distribution is the rows matching `isTarget` (a curated slice, e.g.
    * a known-good source set); raw is the whole corpus. Every token has
    * rc ≥ 1 (raw covers the corpus) but tc may be 0 — covered by the
    * conditional sum inside the single rc aggregate (tc is the
    * when(tgt)-gated count of the same rows, so a bucket with no target
    * hits carries tc = 0 through the inner join and add-α smooths it).
    * The fold is in token-position order.
    *
    * Returns the `topK` most target-like docs:
    * (doc_id, n_toks, weight r6-rounded), ranked by raw weight with
    * doc_id tie-break (TakeOrderedAndProject — never a global sort).
    */
  def dsirWeights(docs: DataFrame, isTarget: Column, buckets: Int = 8192,
      alpha: Double = 0.5, topK: Int = 100): DataFrame = {
    // totals reduce the bucket table rc instead of re-scanning the corpus:
    // rt/tt are sums of exact integer-valued doubles < 2^53 over ≤`buckets`
    // rows — bit-identical to counting the token rows, one full sha60 pass
    // cheaper. (An explicit repartition(f) to also share the rc/join
    // exchange was measured SLOWER: AQE coalesces the tiny shuffle to one
    // partition and serializes everything downstream; the rc side stays a
    // broadcast instead.)
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
    val totals = rc.agg(
      sum(col("rc")).as("rt"),
      sum(col("tc")).as("tt"))
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

  /** Top-K collocations by pointwise mutual information (Church & Hanks
    * 1990, "Word association norms, mutual information, and
    * lexicography" — public paper): PMI(w1, w2) = ln((c12 · N) /
    * (cL(w1) · cR(w2))) over the corpus's adjacent-token bigrams, where
    * c12 is the bigram count, cL/cR the left-/right-slot unigram counts
    * and N the total bigram count. `minCount` drops the low-count pairs
    * whose PMI is dominated by noise (the paper's own caveat). Ranking on
    * the RAW double (pmi desc, then w1/w2), r6 on output.
    *
    * Float discipline: every operand is an exact integer below 2^53 cast
    * to double; the single expression ln((c12·N)/(cL·cR)) is two rounded
    * multiplies, one divide, one ln — identical op order in the oracle,
    * `ln` cross-engine stable (BM25/HLL precedent). No data-dependent
    * float sums at all.
    *
    * Scale shape: three map-side-combined count aggregates keyed by
    * token/pair, a keyed equi-join to decorate pairs with slot counts
    * (the c12 table is the corpus collocation table — NOT broadcastable
    * at 100 TB; the shuffle join is the intended shape), a 1-row N
    * broadcast, and TakeOrderedAndProject for the top-K.
    */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5,
      topK: Int = 50): DataFrame = {
    val bg = bigrams(docs)
    val c12 = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val cL = bg.groupBy(col("w1")).agg(count(lit(1)).as("cl"))
    val cR = bg.groupBy(col("w2")).agg(count(lit(1)).as("cr"))
    val n = bg.agg(count(lit(1)).as("n"))
    val pmi = log((col("c12").cast("double") * col("n").cast("double")) /
      (col("cl").cast("double") * col("cr").cast("double")))
    c12.join(cL, Seq("w1")).join(cR, Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c12"), pmi.as("pmi_raw"))
      .orderBy(col("pmi_raw").desc, col("w1"), col("w2")).limit(topK)
      .select(col("w1"), col("w2"), col("c12"),
        TextAnalysis.r6(col("pmi_raw")).as("pmi"))
  }

  /** Per-document unigram entropy H = −Σ_w p(w)·ln p(w) over the doc's
    * own token distribution — the lexical-diversity quality feature
    * (repetitive template text reads low; varied prose reads near
    * ln(n_distinct)). Bounded above by ln(n_distinct), so the output also
    * carries that ceiling and the normalized ratio (0 for the degenerate
    * single-token doc, where both are 0).
    *
    * Float discipline: per-word terms p·ln p are micro-truncated integers
    * summed order-free (the [[Drift.klVsCorpus]] discipline — exact,
    * commutative, map-side combinable); the ln(n_distinct) ceiling and
    * ratio are computed AFTER the integer sum with one canonical op
    * order.
    *
    * Scale shape: two keyed aggregates ((doc, word) then doc) carrying
    * integers — no per-doc vocabulary ever collects into a row.
    *
    * Returns (doc_id, n_tokens, n_distinct, entropy, entropy_norm).
    */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("w"))
    val cw = tok.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
    val nd = cw.groupBy(col("doc_id"))
      .agg(sum("c").as("n"), count(lit(1)).as("n_distinct"))
    val p = col("c").cast("double") / col("n").cast("double")
    cw.join(nd, "doc_id")
      .select(col("doc_id"), col("n"), col("n_distinct"),
        floor((p * log(p)) * 1000000.0 + 0.5).cast("long").as("tm"))
      .groupBy(col("doc_id"))
      .agg(max("n").as("n_tokens"), max("n_distinct").as("n_distinct"),
        sum("tm").as("hm"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (-(col("hm").cast("double")) / lit(1000000.0)).as("entropy"),
        TextAnalysis.r6(
          when(col("n_distinct") === 1L, lit(0.0))
            .otherwise((-(col("hm").cast("double")) / lit(1000000.0)) /
              log(col("n_distinct").cast("double")))).as("entropy_norm"))
  }

  /** Zipf power-law fit + hapax accounting — the corpus-health row of a
    * data card (natural text follows freq ∝ rank^−s with s ≈ 1; template
    * floods and synthetic soup bend the curve): least-squares slope and
    * intercept of ln(count) on ln(rank) over the top-`k` tokens (rank
    * tie-break: token asc), plus exact vocabulary / hapax-legomena counts
    * (hapax_frac — the one-occurrence fraction, a dedup/quality smell
    * when it collapses).
    *
    * Returns ONE row: (n_tokens, n_vocab, n_hapax, hapax_frac, k_fit,
    * slope, intercept), floats r6-rounded.
    *
    * Float discipline: the four regression sums fold over the top-k rows
    * in RANK order (sort_array over (rank, x, y) structs, seed 0.0 —
    * the ordered-fold contract); slope/intercept share one canonical op
    * order with the oracle.
    *
    * Scale shape: one map-side-combined token count, TakeOrderedAndProject
    * for the top-k (never a global sort), the fold over k ≤ a few hundred
    * rows in a 1-row aggregate; the exact vocab/hapax counts are one more
    * count aggregate over the (token, cnt) table — integers only.
    */
  def zipfFit(docs: DataFrame, k: Int = 100): DataFrame = {
    val counts = docs
      .select(TextAnalysis.tokens(col("text")).as("toks"))
      .select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val vocab = counts.agg(
      sum(col("cnt")).as("n_tokens"),
      count(lit(1)).as("n_vocab"),
      sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("n_hapax"))
    val top = counts
      .orderBy(col("cnt").desc, col("w")).limit(k)
      .select(row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("w"))).cast("long").as("rank"),
        col("cnt"))
      .select(col("rank"), log(col("rank").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
    val folded = top
      .agg(sort_array(collect_list(struct(col("rank"), col("x"), col("y"))))
        .as("pts"))
      .select(size(col("pts")).cast("long").as("k_fit"),
        aggregate(transform(col("pts"), p => p.getField("x")),
          lit(0.0), (a, v) => a + v).as("sx"),
        aggregate(transform(col("pts"), p => p.getField("y")),
          lit(0.0), (a, v) => a + v).as("sy"),
        aggregate(transform(col("pts"),
            p => p.getField("x") * p.getField("y")),
          lit(0.0), (a, v) => a + v).as("sxy"),
        aggregate(transform(col("pts"),
            p => p.getField("x") * p.getField("x")),
          lit(0.0), (a, v) => a + v).as("sxx"))
    val kd = col("k_fit").cast("double")
    val slope = (kd * col("sxy") - col("sx") * col("sy")) /
      (kd * col("sxx") - col("sx") * col("sx"))
    val intercept = (col("sy") - slope * col("sx")) / kd
    folded.crossJoin(broadcast(vocab))
      .select(col("n_tokens"), col("n_vocab"), col("n_hapax"),
        TextAnalysis.r6(col("n_hapax").cast("double") /
          col("n_vocab").cast("double")).as("hapax_frac"),
        col("k_fit"),
        TextAnalysis.r6(slope).as("slope"),
        TextAnalysis.r6(intercept).as("intercept"))
  }
}
