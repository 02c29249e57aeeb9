package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quantile

/** Pins the hash-sampled quantile sketch's operator invariants:
  * deterministic sample membership, per-shard consistency (sample of a
  * union = union of shard samples), type-1 order-statistic exactness on a
  * known multiset, rate validation, and the DKW-style accuracy sanity on a
  * planted distribution. Exact cross-engine values are covered by the
  * q_quantile_sketch DuckDB oracle.
  */
class QuantileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def table(lo: Long, hi: Long) =
    spark.range(lo, hi).select(col("id"), (col("id") % 100).as("v"))

  test("sampling is deterministic and composes across shards") {
    val whole = Quantile.sampleByKey(table(0, 4000), col("id"), 0.3)
      .select("id").as[Long].collect().toSet
    val again = Quantile.sampleByKey(table(0, 4000), col("id"), 0.3)
      .select("id").as[Long].collect().toSet
    assert(whole == again)
    // hash sampling is consistent: per-shard samples union to exactly the
    // whole-table sample — the per-day rollup path needs no re-read
    val shards = Quantile.sampleByKey(table(0, 1500), col("id"), 0.3)
      .select("id").as[Long].collect().toSet ++
      Quantile.sampleByKey(table(1500, 4000), col("id"), 0.3)
        .select("id").as[Long].collect().toSet
    assert(shards == whole)
    // the rate is honored within binomial noise (4000 keys, p=0.3)
    assert(whole.size > 900 && whole.size < 1500, s"sampled ${whole.size}")
  }

  test("order statistics are exact type-1 quantiles of the sample") {
    // rate 1.0 = the sample IS the data: quantiles must be exact order
    // statistics of the known multiset 0..99 repeated
    val out = Quantile.orderStatQuantiles(table(0, 1000), col("id"), col("v"),
        Seq(500, 900, 990, 1000), rate = 1.0)
      .select("q_permille", "n_sample", "v")
      .as[(Int, Long, Long)].collect().toSet
    // 1000 rows of v = id % 100: each value 0..99 appears 10 times; the
    // k-th smallest is (k-1) / 10
    def expected(q: Int): Long = {
      val k = (q.toLong * 1000 + 999) / 1000
      (k - 1) / 10
    }
    assert(out == Set(500, 900, 990, 1000).map(q => (q, 1000L, expected(q))))
  }

  test("sampled quantiles land near true quantiles (DKW sanity)") {
    val out = Quantile.orderStatQuantiles(table(0, 20000), col("id"), col("v"),
        Seq(500, 900), rate = 0.25)
      .select("q_permille", "v").as[(Int, Long)].collect().toMap
    // v uniform on 0..99: true medians 49/50, p90 89/90; m ≈ 5000 sampled
    // rows bounds the CDF error well under ±0.03 → ±3 value points
    assert(math.abs(out(500) - 50L) <= 3, s"median ${out(500)}")
    assert(math.abs(out(900) - 90L) <= 3, s"p90 ${out(900)}")
  }

  test("contracts: rate and permille ranges; empty sample yields no rows") {
    intercept[IllegalArgumentException](Quantile.threshold(0.0))
    intercept[IllegalArgumentException](Quantile.threshold(1.5))
    intercept[IllegalArgumentException](
      Quantile.orderStatQuantiles(table(0, 10), col("id"), col("v"),
        Seq(0), rate = 0.5))
    val empty = Quantile.orderStatQuantiles(
      table(0, 10).filter(col("id") < 0), col("id"), col("v"),
      Seq(500), rate = 0.5)
    assert(empty.count() == 0L)
  }

  test("grouped quantiles are exact per-group order statistics at rate 1.0") {
    // group g0: v = 0..9 ×100 each; group g1: v = 0..4 ×200 each — known
    // multisets, so per-group type-1 stats are closed-form
    val d = spark.range(0, 2000).select(col("id"),
      when(col("id") < 1000, "g0").otherwise("g1").as("g"),
      when(col("id") < 1000, col("id") % 10).otherwise(col("id") % 5).as("v"))
    val out = Quantile.groupedOrderStatQuantiles(d, col("g"), col("id"),
        col("v"), Seq(500, 900), rate = 1.0)
      .as[(String, Int, Long, Long)].collect().toSet
    def exp(q: Int, per: Int): Long = {
      val k = (q.toLong * 1000 + 999) / 1000
      (k - 1) / (1000 / per)
    }
    assert(out == Set(
      ("g0", 500, 1000L, exp(500, 10)), ("g0", 900, 1000L, exp(900, 10)),
      ("g1", 500, 1000L, exp(500, 5)), ("g1", 900, 1000L, exp(900, 5))))
  }

  test("grouped matches ungrouped when there is one group; empty groups absent") {
    val d = table(0, 4000).withColumn("g", lit("only"))
    val grouped = Quantile.groupedOrderStatQuantiles(d, col("g"), col("id"),
        col("v"), Seq(500, 990), rate = 0.3)
      .select("q_permille", "n_sample", "v")
      .as[(Int, Long, Long)].collect().toSet
    val global = Quantile.orderStatQuantiles(d, col("id"), col("v"),
        Seq(500, 990), rate = 0.3)
      .as[(Int, Long, Long)].collect().toSet
    assert(grouped == global)
    // a group whose every key misses the sample emits nothing rather
    // than a null quantile
    val sparse = d.withColumn("g",
      when(col("id") === 17, "lonely").otherwise("only"))
    val gs = Quantile.groupedOrderStatQuantiles(sparse, col("g"), col("id"),
        col("v"), Seq(500), rate = 0.3)
      .select("g").as[String].collect().toSet
    assert(!gs.contains("lonely") ||
      Quantile.sampleByKey(d.filter(col("id") === 17), col("id"), 0.3)
        .count() == 1L)
  }

  test("robustOutliers: flags beyond k*MAD, median/MAD are type-1 values") {
    val d = Seq(
      ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L), ("a", 4L, 12L),
      ("a", 5L, 100L), // mad=0 within {10,10,10,12,100}? med=10, adevs 0,0,0,2,90 -> mad=0
      ("b", 6L, 1L), ("b", 7L, 2L), ("b", 8L, 3L)) // med=2, adevs 1,0,1 -> mad=1, none >3
      .toDF("g", "id", "x")
    val out = Quantile.robustOutliers(d, col("g"), col("id"), col("x"), k = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("x"), r.getAs[Long]("med"), r.getAs[Long]("mad"))).toMap
    // group a: med 10, MAD 0 => any deviation flags (ids 4 and 5)
    assert(out.keySet == Set(4L, 5L))
    assert(out(5L) == ((100L, 10L, 0L)))
  }

  test("robustOutliers: a mega-value cannot drag the gate (50% breakdown)") {
    // mean/stddev would swallow 1000 into the spread; median/MAD do not
    val d = (1L to 9L).map(i => ("s", i, 50L + i)) :+ (("s", 99L, 1000L))
    val out = Quantile.robustOutliers(d.toDF("g", "id", "x"),
      col("g"), col("id"), col("x"), k = 3).collect()
    assert(out.map(_.getAs[Long]("id")).toSet == Set(99L))
  }
}
