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

  test("events scan prunes columns and pushes the filter down") {
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_type") === "error").select("event_id", "ts")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,error)]"), p)
    assert(p.contains("ReadSchema: struct<event_id:bigint,ts:timestamp"), p)
  }
}
