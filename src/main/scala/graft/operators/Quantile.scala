package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic hash-sampled quantile sketch: order statistics over a
  * reproducible Bernoulli sample — the "pick the p99 length threshold
  * WITHOUT sorting 100 TB" primitive of a curation campaign (length /
  * score / token-count cutoffs are all chosen from distribution tails).
  *
  * Sampling is a pure function of the row KEY: a row is in the sample iff
  * `sha60("qs:" || key) < rate·2^60` ([[Hashing.sha60]], the cross-engine
  * kernel — the DuckDB oracle replays the sample membership exactly, which
  * no RNG-based `df.sample` can offer; the "qs:" salt decorrelates this
  * hash ring from the hash-split / stratified-sampling rings over the same
  * keys). Quantiles are TYPE-1 order statistics of the sample — the
  * ceil(q·n)-th smallest value — so integer values stay integers end to
  * end: no interpolation, no floating point, exact value-hash parity.
  *
  * Determinism buys composability: hash sampling is CONSISTENT, so the
  * sample of a union is the union of per-shard samples — per-day / per-
  * shard samples concatenate into the corpus sample with no re-read, the
  * same rollup shape as the [[Frequency]]/[[Cardinality]] merges.
  *
  * The 100 TB shape: the sample predicate is one codegen'd hash-compare in
  * the scan stage (no shuffle, no state); the sample then collapses to a
  * per-value histogram (map-side combine — the one shuffle carries counts,
  * not rows), and rank lookup walks the value-ordered cumulative histogram,
  * so nothing ever sorts the sample itself (r = 10^-5 of 10^12 rows → 10^7
  * sampled values → |distinct v| histogram rows). Accuracy: by Dvoretzky–Kiefer–
  * Wolfowitz the sampled CDF is within ε of the true CDF everywhere with
  * probability 1−δ for m ≥ ln(2/δ)/(2ε²) — m = 10^7 gives ε ≈ 0.0005, far
  * tighter than any curation threshold needs.
  *
  * No reference analogue (freader keeps per-file counters only) — this
  * completes the sizing-sketch family next to [[Frequency]] (how often) and
  * [[Cardinality]] (how many distinct): how is it DISTRIBUTED.
  */
object Quantile {

  /** 2^60 — the sha60 value range. */
  private val HashSpan = 1L << 60

  /** Sample-membership threshold for a rate in (0, 1]. Computed once,
    * driver-side, so the engine filter and the oracle SQL embed the SAME
    * integer literal (deriving it in SQL from a double would invite
    * rounding drift).
    */
  def threshold(rate: Double): Long = {
    require(rate > 0.0 && rate <= 1.0 && !rate.isNaN,
      s"sample rate $rate outside (0, 1]")
    math.min(HashSpan, (rate * HashSpan.toDouble).toLong)
  }

  /** The deterministic Bernoulli sample: rows whose salted key hash falls
    * under `threshold(rate)`. A pushed-down scan-stage predicate — no
    * shuffle, no state.
    */
  def sampleByKey(df: DataFrame, keyCol: Column, rate: Double): DataFrame =
    // rate 1.0 admits every row (sha60 < 2^60 always) — short-circuit so
    // exact-mode callers (robustOutliers) don't pay a per-row sha256
    if (rate >= 1.0) df
    else df.filter(
      Hashing.sha60(concat(lit("qs:"), keyCol.cast("string"))) <
        lit(threshold(rate)))

  /** Type-1 quantiles (ceil(q·n)-th order statistics) of `valueCol` over
    * the hash sample. `permille` lists the requested quantiles in integer
    * permille (500 = median, 990 = p99) so rank arithmetic is pure integer
    * — `rank = (q·n + 999) div 1000` — and exactly reproducible in the
    * oracle. Returns one row per requested quantile:
    * (q_permille int, n_sample long, v long); an empty sample returns no
    * rows (there is no order statistic to report).
    *
    * Rank lookup is HISTOGRAM-SPAN matching, not a full-sample sort: the
    * sample collapses to per-value counts (one map-side-combined groupBy —
    * the shuffle carries ≤ |distinct v| integer rows per task), a running
    * sum over the value-ordered histogram assigns each value its rank span
    * `(cum − cnt, cum]`, and the value holding rank k is the one whose span
    * contains k. The single-partition window runs over DISTINCT values only
    * (token counts, lengths, scores — thousands of rows), never the sample;
    * for a value domain so fine-grained that |distinct v| approaches the
    * sample size, pre-bucket `valueCol` before calling (the quantile of the
    * bucketed value bounds the true one by the bucket width).
    */
  def orderStatQuantiles(df: DataFrame, keyCol: Column, valueCol: Column,
      permille: Seq[Int], rate: Double): DataFrame = {
    require(permille.nonEmpty && permille.forall(q => q >= 1 && q <= 1000),
      s"quantile permille values must be in [1, 1000]: $permille")
    val spark = df.sparkSession
    import spark.implicits._
    val hist = sampleByKey(df, keyCol, rate)
      .groupBy(valueCol.cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    // one window pass over the tiny histogram yields both the rank spans
    // and the sample size (no second scan of the input)
    val ordered = Window.orderBy(col("v"))
    val spans = hist
      .withColumn("cum", sum(col("cnt")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_sample", sum(col("cnt")).over(
        ordered.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    spans.crossJoin(broadcast(permille.toDF("q_permille")))
      .withColumn("rk", expr("(q_permille * n_sample + 999) div 1000"))
      .filter(col("cum") >= col("rk") && col("cum") - col("cnt") < col("rk"))
      .select(col("q_permille"), col("n_sample"), col("v"))
  }

  /** Per-group variant of [[orderStatQuantiles]]: type-1 quantiles of
    * `valueCol` within each `groupCol` stratum (per-language length
    * distributions, per-source quality tails — the "one threshold per
    * stratum" face of a curation pass). Same sample ring, same integer
    * rank arithmetic; returns (g, q_permille int, n_sample long, v long),
    * one row per (group, quantile), groups with an empty sample absent.
    *
    * This is the BETTER-scaling shape of the two: every window partitions
    * by the group key, so the histogram walk parallelizes across strata
    * and no single-partition stage exists at all — both window passes and
    * the groupBy share the one exchange on (g)/(g, v).
    */
  def groupedOrderStatQuantiles(df: DataFrame, groupCol: Column,
      keyCol: Column, valueCol: Column, permille: Seq[Int],
      rate: Double): DataFrame = {
    require(permille.nonEmpty && permille.forall(q => q >= 1 && q <= 1000),
      s"quantile permille values must be in [1, 1000]: $permille")
    val spark = df.sparkSession
    import spark.implicits._
    val hist = sampleByKey(df, keyCol, rate)
      .groupBy(groupCol.as("g"), valueCol.cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val ordered = Window.partitionBy(col("g")).orderBy(col("v"))
    val spans = hist
      .withColumn("cum", sum(col("cnt")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_sample", sum(col("cnt")).over(Window.partitionBy(col("g"))))
    spans.crossJoin(broadcast(permille.toDF("q_permille")))
      .withColumn("rk", expr("(q_permille * n_sample + 999) div 1000"))
      .filter(col("cum") >= col("rk") && col("cum") - col("cnt") < col("rk"))
      .select(col("g"), col("q_permille"), col("n_sample"), col("v"))
  }

  /** Robust per-group outlier gate: flag rows whose value deviates from
    * the group median by more than `k`× the group MAD (median absolute
    * deviation) — the curation filter that, unlike mean/stddev z-scores,
    * a handful of extreme documents cannot drag (median and MAD have 50%
    * breakdown; one mega-doc shifts a mean arbitrarily but moves an order
    * statistic by at most one rank).
    *
    * Entirely integer order statistics (both medians are TYPE-1 — actual
    * data values via [[groupedOrderStatQuantiles]] at rate 1.0), so the
    * whole surface is float-free and exactly re-derivable cross-engine.
    * Scale shape: two grouped-quantile passes (per-group value histograms,
    * map-side combined, windows partitioned by group) plus two broadcast-
    * sized joins (one (g, med|mad) row per group). A zero MAD (over half
    * the group at one value) flags ANY deviation — the degenerate case is
    * deterministic, not an error.
    */
  def robustOutliers(df: DataFrame, groupCol: Column, keyCol: Column,
      valueCol: Column, k: Int = 3): DataFrame = {
    val med = groupedOrderStatQuantiles(df, groupCol, keyCol, valueCol,
        Seq(500), rate = 1.0)
      .select(col("g"), col("v").as("med"))
    val dd = df.select(groupCol.as("g"), keyCol.as("id"),
        valueCol.cast("long").as("x"))
      .join(broadcast(med), "g")
      .withColumn("adev", abs(col("x") - col("med")))
    val mad = groupedOrderStatQuantiles(dd, col("g"), col("id"), col("adev"),
        Seq(500), rate = 1.0)
      .select(col("g"), col("v").as("mad"))
    dd.join(broadcast(mad), "g")
      .filter(col("adev") > lit(k.toLong) * col("mad"))
      .select(col("id"), col("g"), col("x"), col("med"), col("mad"))
  }
}
