package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the PHYSICAL-PLAN claims the scale story rests on (COVERAGE.md /
  * BENCH.md): zero-shuffle pure-expression queries stay shuffle-free,
  * top-k queries keep their heap/limit operators, and the enrich join
  * stays broadcast. A Spark upgrade or refactor that silently regresses
  * a plan shape fails here rather than only in a bench read-through.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  private def exchanges(p: String): Int =
    "(?<!Broadcast)Exchange".r.findAllIn(p).size

  test("pure-expression queries plan with zero shuffle") {
    for (q <- Seq("q_pii_scrub", "q_chunk_windows", "q_token_count",
        "q_lang_id", "q_quality", "q_sample_split")) {
      val p = plan(q)
      assert(exchanges(p) == 0, s"$q grew a shuffle:\n$p")
    }
  }

  test("vocab top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort [cnt"), p)
  }

  test("stratified sample gets WindowGroupLimit pushdown around its one exchange") {
    val p = plan("q_stratified_sample")
    assert(p.contains("WindowGroupLimit"), p)
    assert(exchanges(p) == 1, p)
  }

  test("embedding outlier scoring is a pure projection plus one window exchange") {
    // the centroid fit runs at construction; the returned plan must only
    // score + rank — one shuffle for the per-label window, nothing else
    val p = plan("q_emb_outlier")
    assert(exchanges(p) == 1, p)
  }

  test("enrich stays a broadcast hash join") {
    val p = operators.Enrich.enrich(
      sources.Transcripts.fromEvents(spark, dir)).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("incremental dedup batch plans: hash joins only, never nested-loop/cartesian") {
    import org.apache.spark.sql.functions.col
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val store = java.nio.file.Files.createTempDirectory("graft-planshape-inc").toString
    operators.Dedup.incrementalExactStaged(
      d.filter(col("doc_id") % 2 === 0), "doc_id", "text", store).commit()
    val pExact = operators.Dedup.incrementalExactStaged(
        d.filter(col("doc_id") % 2 === 1), "doc_id", "text", store)
      .fresh.queryExecution.executedPlan.toString
    val store2 = java.nio.file.Files.createTempDirectory("graft-planshape-incmh").toString
    operators.Dedup.incrementalMinhashStaged(
      d.filter(col("doc_id") % 2 === 0), "doc_id", "text", store2,
      n = 3, bands = 4, rowsPerBand = 2, threshold = 0.6).commit()
    val pMh = operators.Dedup.incrementalMinhashStaged(
        d.filter(col("doc_id") % 2 === 1), "doc_id", "text", store2,
        n = 3, bands = 4, rowsPerBand = 2, threshold = 0.6)
      .fresh.queryExecution.executedPlan.toString
    for ((name, p) <- Seq("incrementalExact" -> pExact, "incrementalMinhash" -> pMh)) {
      assert(!p.contains("CartesianProduct"), s"$name planned a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name planned a BNLJ:\n$p")
    }
    // the store anti-join keys on the 8-byte content hash (an equi hash
    // join — broadcast or shuffled, either is the scale shape)
    assert(pExact.contains("LeftAnti"), pExact)
  }

  test("sketch queries: bounded-state aggregates with partial combine; CMS probe stays broadcast") {
    // HLL registers: the only exchange carries (bucket, partial-max) — a
    // partial_max must appear BEFORE the shuffle so map tasks ship ≤256
    // rows regardless of input size; same for the CMS (row, col) counts
    import org.apache.spark.sql.functions.col
    val items = spark.range(0, 1000).select(col("id").cast("string").as("s"))
    val pHll = operators.Cardinality.registers(items, col("s"))
      .queryExecution.executedPlan.toString
    assert(pHll.contains("partial_max"), pHll)
    val pCms = operators.Frequency.sketch(items, functions.Hashing.sha60(col("s")))
      .queryExecution.executedPlan.toString
    assert(pCms.contains("partial_count"), pCms)
    // the estimate probe joins a broadcast of the tiny counter table —
    // never a shuffle of the query side against it
    val sk = operators.Frequency.sketch(items, functions.Hashing.sha60(col("s")))
    val pEst = operators.Frequency.estimate(sk, items.limit(5),
      functions.Hashing.sha60(col("s"))).queryExecution.executedPlan.toString
    assert(pEst.contains("BroadcastHashJoin"), pEst)
    assert(!pEst.contains("SortMergeJoin"), pEst)
  }

  test("quantile sketch: histogram combines map-side; nothing sorts the sample") {
    // the per-value groupBy must partial-combine before its exchange (the
    // shuffle carries counts, not sampled rows), and the only Sort nodes
    // belong to the tiny histogram window — no sample-wide global sort
    val p = plan("q_quantile_sketch")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("dup spans: inverted-index joins stay hash-based, no cartesian") {
    val p = plan("q_dup_spans")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_count"), p)
  }

  test("winnow coverage: inverted-index joins stay hash-based, no cartesian") {
    val p = plan("q_winnow_fp")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_count"), p)
  }

  test("corpus drift: counts-only exchanges, broadcast totals, no grid") {
    // the word-keyed join carries (source,word,c)×(word,cw) count rows;
    // per-source totals broadcast; the only nested-loop join is the 1-row
    // corpus-total crossJoin — a sources×vocab grid would show as a
    // non-broadcast cartesian and must never appear
    val p = plan("q_corpus_drift")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("snapshot diff: 8-byte hash join, text never shuffles") {
    // structural pin: inspect every shuffle's OUTPUT attributes — hashing
    // must happen below the exchange, so no shuffled row carries `text`.
    // AQE's root node hides exchanges from collect() until execution (and
    // its inputPlan predates EnsureRequirements), so plan without AQE
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val ep =
      try SparkEntry.queries("q_snapshot_diff")(spark, dir)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(!ep.toString.contains("CartesianProduct"), ep.toString)
    val shuffles = ep.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.nonEmpty, ep.toString)
    shuffles.foreach { e =>
      assert(e.output.forall(_.name != "text"),
        s"a shuffle carries the text payload:\n$e")
    }
  }

  test("source mixing is a zero-shuffle broadcast-dimension filter") {
    val p = plan("q_mix_sources")
    assert(exchanges(p) == 0, s"mixing grew a shuffle:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("grouped quantiles: per-group windows, no single-partition stage") {
    val p = plan("q_group_quantiles")
    // the histogram partial-combines before its one exchange, and every
    // exchange is hash-partitioned — no SinglePartition coalesce anywhere
    assert(p.contains("partial_count"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("source report: distinct-agg two-stage shape, counts-only exchanges") {
    // count(distinct lang) legally plans as partial-by-(source,lang) →
    // exchange → merge-by-(source): TWO exchanges, both carrying
    // map-side-combined counts (≤ |source×lang| rows), never input rows
    val p = plan("q_source_report")
    assert(exchanges(p) == 2, s"report grew an exchange:\n$p")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("shard order: one exchange on the shard key feeds the rank window") {
    val p = plan("q_shard_order")
    assert(exchanges(p) == 1, s"shard order should shuffle exactly once:\n$p")
    assert(!p.contains("SinglePartition"), p)
  }

  test("semdedup: equi-joins only, no cartesian, no single-partition stage") {
    // the k-means fit runs at construction (model-sized collects); the
    // returned plan must be assignment projections + the within-cluster
    // equi-join + the loser left join — every join keyed (cid / id), none
    // nested-loop. The loser join may be SortMergeJoin: losers can be a
    // large fraction of rows at scale, so a shuffle join on 8-byte ids is
    // the shape we WANT there, not a broadcast.
    val p = plan("q_semdedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("span scrub: keep-first window keyed by hash, no cartesian, no single partition") {
    // the keep-first shuffle must be hash-partitioned on the 8-byte block
    // hash; reconstruction is expression-only (no second Generate after
    // the join); nothing funnels to one partition
    val p = plan("q_span_scrub")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("hashpartitioning(h"), s"keep-first not keyed by hash:\n$p")
  }

  test("temperature mix: sampling pass is broadcast-filter; report joins stay small") {
    val p = plan("q_mix_temperature")
    assert(!p.contains("CartesianProduct"), p)
    // the row-scale pass (ring filter behind the rate dim) must broadcast
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("lm bits: count joins are hash equi-joins; tercile window per lang") {
    // the per-position bigram-probability join is the INTENDED shuffle
    // shape (a corpus bigram table is not broadcastable at scale, though
    // AQE may broadcast at test SF) — what must never appear is a
    // cartesian. (The vocab fit keeps its one-ROW global distinct-count
    // final stage — a SinglePartition over pre-combined partials is the
    // correct shape for a scalar, so it is not banned here.)
    val p = plan("q_lm_bits")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dsir: ends in TakeOrderedAndProject, never a global sort") {
    val p = plan("q_dsir_select")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("events scan prunes columns and pushes the filter down") {
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_type") === "error").select("event_id", "ts")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,error)]"), p)
    assert(p.contains("ReadSchema: struct<event_id:bigint,ts:timestamp"), p)
  }
}
