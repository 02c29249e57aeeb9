package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketed

/** Pins the bucketed-store claims: the anti-join's ONLY Exchange is the
  * incoming batch (the store's on-disk bucketing satisfies the join
  * distribution — at 100 TB the store is the big side, and this is the
  * shuffle that must not happen), point probes bucket-prune, and the
  * survivors match set semantics. Cross-engine values are covered by the
  * q_dedup_bucketed oracle (text-domain NOT IN vs the engine's sha60
  * anti-join).
  */
class BucketedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dedupAgainst drops exactly the store's content") {
    val seen = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val batch = Seq((10L, "alpha"), (11L, "gamma"), (12L, "beta"),
      (13L, "delta")).toDF("doc_id", "text")
    Bucketed.writeSeen(seen, "text", "graft_spec_seen", 8)
    val out = Bucketed.dedupAgainst(batch, "doc_id", "text", "graft_spec_seen")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out == Set(11L, 13L))
  }

  test("anti-join plan: store side reads bucketed with NO Exchange") {
    val batch = spark.range(0, 100)
      .select(col("id").as("doc_id"), concat(lit("t"), col("id")).as("text"))
    Bucketed.writeSeen(batch.filter(col("doc_id") < 50), "text",
      "graft_spec_plan", 8)
    withNoBroadcast {
      val p = Bucketed.dedupAgainst(batch, "doc_id", "text", "graft_spec_plan")
        .queryExecution.executedPlan.toString
      // the store scan must be a bucketed read...
      assert(p.contains("SelectedBucketsCount: 8 out of 8"), p)
      // ...and the ONLY shuffle is the batch side being brought to the
      // store's distribution: one hash Exchange, not two
      val exch = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exch == 1, s"store side grew a shuffle:\n$p")
    }
  }

  test("point probe prunes to a single bucket") {
    // writes its own table — no coupling to the other tests' stores
    val rows = spark.range(0, 64)
      .select(col("id").as("doc_id"), concat(lit("p"), col("id")).as("text"))
    Bucketed.writeSeen(rows, "text", "graft_spec_probe", 8)
    // a bare scan+filter has no distribution requirement, so Spark's
    // DisableUnnecessaryBucketedScan turns the bucketed read off by
    // default; a point-probe workload re-enables it to get pruning
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val h = graft.functions.Hashing.sha60Jvm("p7")
      val p = spark.table("graft_spec_probe").filter(col("h") === h)
        .queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 1 out of 8"), p)
    } finally spark.conf.set(key, prev)
  }
}
