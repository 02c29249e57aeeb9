package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hashing
import graft.operators.Frequency

/** Pins the count-min sketch's operator invariants: the one-sided error
  * guarantee (never undercounts), exactness on a sparse universe,
  * counter-wise merge distributivity, zero for never-seen items, and the
  * depth/width contracts. Exact cross-engine counter values are covered by
  * the q_freq_sketch DuckDB oracle.
  */
class FrequencySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** `n` rows over `k` distinct items: item j appears with multiplicity
    * proportional to its index, a skewed multiset with known counts.
    */
  private def multiset(n: Long, k: Int) =
    spark.range(n).select(concat(lit("w-"), col("id") % k).as("s"))

  test("never undercounts: estimate >= exact for every queried item") {
    val items = multiset(5000, 200)
    val sk = Frequency.sketch(items, Hashing.sha60(col("s")))
    val exact = items.groupBy("s").agg(count(lit(1)).as("cnt_exact"))
    val rows = Frequency.estimate(sk, exact, Hashing.sha60(col("s")))
      .select("s", "cnt_exact", "cnt_est")
      .as[(String, Long, Long)](org.apache.spark.sql.Encoders.product[(String, Long, Long)])
      .collect()
    assert(rows.length == 200)
    rows.foreach { case (s, ex, est) => assert(est >= ex, s"$s: $est < $ex") }
  }

  test("sparse universe estimates exactly (no colliding keys at w=1024)") {
    val items = multiset(1000, 5)
    val sk = Frequency.sketch(items, Hashing.sha60(col("s")))
    val exact = items.groupBy("s").agg(count(lit(1)).as("cnt_exact"))
    val rows = Frequency.estimate(sk, exact, Hashing.sha60(col("s")))
      .filter(col("cnt_est") =!= col("cnt_exact")).count()
    assert(rows == 0L)
  }

  test("merge of shard sketches equals the sketch of the union, counter-for-counter") {
    val a = Frequency.sketch(multiset(2000, 50), Hashing.sha60(col("s")))
    val b = Frequency.sketch(multiset(3000, 80), Hashing.sha60(col("s")))
    val merged = Frequency.merge(a, b)
    val whole = Frequency.sketch(
      multiset(2000, 50).unionAll(multiset(3000, 80)), Hashing.sha60(col("s")))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("never-seen items estimate zero against an empty sketch") {
    val sk = Frequency.sketch(multiset(0, 1), Hashing.sha60(col("s")))
    val q = multiset(10, 10).distinct()
    val zeros = Frequency.estimate(sk, q, Hashing.sha60(col("s")))
      .filter(col("cnt_est") =!= 0L).count()
    assert(zeros == 0L)
  }

  test("query columns named cnt/row/col survive the probe join; __cms_* reserved") {
    val items = multiset(500, 20)
    val sk = Frequency.sketch(items, Hashing.sha60(col("s")))
    val q = items.groupBy("s").agg(count(lit(1)).as("cnt"))
      .withColumn("row", lit(1)).withColumn("col", lit(2))
    val out = Frequency.estimate(sk, q, Hashing.sha60(col("s")))
    assert(out.filter(col("cnt_est") < col("cnt")).count() == 0L)
    intercept[IllegalArgumentException](
      Frequency.estimate(sk, q.withColumnRenamed("row", "__cms_row"),
        Hashing.sha60(col("s"))))
  }

  test("depth/width contracts rejected up front") {
    intercept[IllegalArgumentException](
      Frequency.sketch(multiset(1, 1), Hashing.sha60(col("s")), d = 0))
    intercept[IllegalArgumentException](
      Frequency.sketch(multiset(1, 1), Hashing.sha60(col("s")), w = 1))
    intercept[IllegalArgumentException](Frequency.merge())
  }
}
