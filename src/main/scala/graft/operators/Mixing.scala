package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic source-mixing sampler — the "blend the corpus to a target
  * recipe" stage of a training-data pipeline (wiki × 2 epochs, web × 0.25,
  * forums × 0.5, …): each source is down-sampled to its own acceptance
  * rate, reproducibly.
  *
  * Membership is a pure function of the row key — a row survives iff
  * `sha60("mix:" || key) mod 1000 < rate_permille(source)` ([[Hashing.sha60]],
  * the cross-engine kernel; the "mix:" salt decorrelates this ring from the
  * split / stratified-sample / quantile-sample rings over the same keys).
  * No RNG means the blend is reshuffle-stable, replayable across reruns and
  * engines, and CONSISTENT: per-shard blends union to the corpus blend, so
  * incremental batches can be mixed independently and concatenated — the
  * same rollup property as the sketch merges.
  *
  * The 100 TB shape: the rate table is a broadcast dimension (tens-to-
  * thousands of sources vs billions of rows — the [[Enrich]] join shape) and
  * the membership test is one codegen'd hash-compare, so the whole operator
  * is a scan-stage filter: zero shuffles, zero state, trivially resumable.
  * Sources absent from the rate table are DROPPED (the rate table is an
  * explicit allowlist — a silent pass-through would un-mix the blend the
  * moment an upstream adds a source).
  *
  * No reference analogue (freader routes, it never samples); this is the
  * corpus-composition stage the curation capstone feeds.
  */
object Mixing {

  /** Down-sample `df` per source at `ratesPermille` (0 = drop all,
    * 1000 = keep all). Returns the surviving rows with their original
    * columns. `keyCol` must be stable and unique per row (the dedup /
    * split discipline); `salt` names the hash ring.
    */
  def mixBySource(df: DataFrame, keyCol: Column, sourceCol: Column,
      ratesPermille: Map[String, Int], salt: String = "mix"): DataFrame = {
    require(ratesPermille.nonEmpty, "mixBySource: empty rate table")
    ratesPermille.foreach { case (s, r) =>
      require(r >= 0 && r <= 1000,
        s"mixBySource: rate for '$s' outside [0, 1000]: $r")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val rates = broadcast(
      ratesPermille.toSeq.toDF("_mix_source", "_mix_rate"))
    val ring =
      Hashing.sha60(concat(lit(salt + ":"), keyCol.cast("string"))) % 1000
    df.join(rates, sourceCol === col("_mix_source"))
      .filter(ring < col("_mix_rate"))
      .drop("_mix_source", "_mix_rate")
  }

  /** Mixing with EPOCH upsampling — the other half of a real blend recipe:
    * rates may exceed 1000 permille, and a source at rate r contributes
    * `floor(r / 1000)` full copies of every row plus one more iff the
    * row's hash ring falls under `r mod 1000` (so rate 2250 = every row
    * twice, every fourth row three times — exactly 2.25 expected epochs).
    * Returns the surviving rows with an extra `epoch` column (0-based copy
    * index) so a downstream shuffle/pack stage can interleave copies.
    *
    * Same determinism contract as [[mixBySource]] (which this generalizes:
    * rates ≤ 1000 never duplicate). The duplication is an `explode` over a
    * generated [0, copies) sequence — rows widen AFTER the broadcast join,
    * still zero shuffles, and the blowup is bounded by max(rate)/1000.
    */
  def mixWithEpochs(df: DataFrame, keyCol: Column, sourceCol: Column,
      ratesPermille: Map[String, Int], salt: String = "mix"): DataFrame = {
    require(ratesPermille.nonEmpty, "mixWithEpochs: empty rate table")
    ratesPermille.foreach { case (s, r) =>
      require(r >= 0 && r <= 100000,
        s"mixWithEpochs: rate for '$s' outside [0, 100000]: $r")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val rates = broadcast(
      ratesPermille.toSeq.toDF("_mix_source", "_mix_rate"))
    val ring =
      Hashing.sha60(concat(lit(salt + ":"), keyCol.cast("string"))) % 1000
    df.join(rates, sourceCol === col("_mix_source"))
      .withColumn("_mix_copies",
        expr("_mix_rate div 1000").cast("int") +
          when(ring < col("_mix_rate") % 1000, 1).otherwise(0))
      .filter(col("_mix_copies") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0), col("_mix_copies") - 1)))
      .drop("_mix_source", "_mix_rate", "_mix_copies")
  }

  /** Temperature-sampled source blend at T = 2 (α = 1/2) — the
    * multilingual / multi-source rebalancing rule of Conneau & Lample 2019
    * (arXiv:1901.07291 §3.1) and mT5 (arXiv:2010.11934 §3.2): sample
    * source s proportionally to p_s^α, which UP-weights small sources and
    * DOWN-weights dominant ones relative to natural frequency. α is fixed
    * at 1/2 so the power is `sqrt` — the one power IEEE-754 requires
    * correctly rounded, hence bit-identical across Spark, DuckDB and the
    * JVM (general `pow` is only 1-ulp-accurate in fdlibm and would flip
    * floor() at rate boundaries between engines).
    *
    * Fit: per-source token counts c_s (exact integers), share
    * q_s = sqrt(c_s) / Σ sqrt(c_s) with the sum folded in SOURCE-NAME
    * order from seed 0.0 (the ordered-fold float discipline), token budget
    * B = floor(total · budgetPermille / 1000) (exact integer arithmetic),
    * acceptance rate_s = min(1000, floor((B · 1000.0 · q_s) / c_s)) — the
    * permille at which source s's expected sampled tokens ≈ B·q_s.
    * Sampling then IS [[mixBySource]] on the `salt` ring (deterministic,
    * reshuffle-stable, per-shard consistent).
    *
    * Returns the per-source recipe + outcome: (source, n_docs, n_tokens,
    * rate_permille, sampled_docs, sampled_tokens).
    *
    * Scale shape: the fit collects ONE row per source (a data-card-sized
    * model fit — the k-means-centroid precedent, never row-scale); the
    * sampling pass is the zero-shuffle broadcast-filter of
    * [[mixBySource]]; the report is one map-side-combined aggregate.
    */
  def temperatureMix(df: DataFrame, keyCol: Column, sourceCol: Column,
      textCol: Column, budgetPermille: Int = 500,
      salt: String = "tmix"): DataFrame = {
    require(budgetPermille >= 0 && budgetPermille <= 1000,
      s"temperatureMix: budgetPermille outside [0, 1000]: $budgetPermille")
    val base = df.select(keyCol.as("_tm_key"), sourceCol.as("_tm_source"),
      size(TextAnalysis.tokens(textCol)).cast("long").as("_tm_toks"))
    val counts = base.groupBy(col("_tm_source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_tm_toks")).as("n_tokens"))
      .collect()
      .map(r => (r.getAs[String]("_tm_source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens")))
      .sortBy(_._1)
    // empty input: return an empty recipe (matching schema) instead of
    // tripping mixBySource's non-empty-rate-table require with a message
    // about a table the caller never passed
    if (counts.isEmpty) {
      val spark0 = df.sparkSession
      import spark0.implicits._
      return Seq.empty[(String, Long, Long, Int, Long, Long)]
        .toDF("source", "n_docs", "n_tokens", "rate_permille",
          "sampled_docs", "sampled_tokens")
    }
    val total = counts.map(_._3).sum
    val budget = total * budgetPermille / 1000 // integer floor, exact
    val sumSqrt = counts.foldLeft(0.0)((a, c) => a + math.sqrt(c._3.toDouble))
    val rates: Map[String, Int] = counts.map { case (s, _, cs) =>
      val q = math.sqrt(cs.toDouble) / sumSqrt
      val r = math.floor((budget * 1000.0 * q) / cs.toDouble)
      s -> math.min(1000.0, r).toInt
    }.toMap
    val spark = df.sparkSession
    import spark.implicits._
    // both final-join sides are source-cardinality rows; no hint needed
    // (a broadcast hint on the PRESERVED side of a left join is ignored)
    val dim = counts.map { case (s, d, t) =>
      (s, d, t, rates(s)) }.toSeq
      .toDF("source", "n_docs", "n_tokens", "rate_permille")
    val sampled = mixBySource(base, col("_tm_key"), col("_tm_source"), rates,
      salt)
      .groupBy(col("_tm_source").as("source"))
      .agg(count(lit(1)).as("sampled_docs"),
        sum(col("_tm_toks")).as("sampled_tokens"))
    // left join keeps rate-0 sources in the recipe with zero outcomes
    dim.join(sampled, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("rate_permille").cast("int").as("rate_permille"),
        coalesce(col("sampled_docs"), lit(0L)).as("sampled_docs"),
        coalesce(col("sampled_tokens"), lit(0L)).as("sampled_tokens"))
  }
}
