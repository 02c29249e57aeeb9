package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cardinality

/** Pins the deterministic HLL sketch's operator invariants: accuracy at
  * both estimator branches, duplicate-insensitivity, register-wise merge
  * distributivity (the per-shard rollup path), and the empty-input floor.
  * Exact cross-engine register/estimate values are covered by the
  * q_cardinality_sketch DuckDB oracle.
  */
class CardinalitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def items(lo: Long, hi: Long) =
    spark.range(lo, hi).select(concat(lit("item-"), col("id")).as("s"))

  private def est(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
    val r = Cardinality.sketch(df, col("s")).head()
    (r.getLong(0), r.getDouble(1))
  }

  test("precision ranges of the two halves agree; mismatched p is rejected up front") {
    intercept[IllegalArgumentException](Cardinality.registers(items(0, 10), col("s"), 6))
    intercept[IllegalArgumentException](Cardinality.merge(8))
    intercept[IllegalArgumentException](
      Cardinality.merge(6, Cardinality.registers(items(0, 10), col("s"))))
  }

  test("merging a higher-precision register table fails the job, not the math") {
    // p=10 buckets reach 1023; a p=8 merge (max bucket 255) must error at
    // execution instead of silently mis-scaling the union sketch
    val atP10 = Cardinality.registers(items(0, 2000), col("s"), p = 10)
    val ex = intercept[Exception](Cardinality.merge(8, atP10).count())
    assert(ex.getMessage.contains("register bucket out of range"),
      s"unexpected error: ${ex.getMessage}")
  }

  test("raw branch: 10k distinct estimated within 3 sigma (19.5% at m=256)") {
    val (occ, e) = est(items(0, 10000))
    assert(occ == 256L) // every bucket hit at n >> m ln m
    assert(math.abs(e - 10000.0) / 10000.0 < 0.195, s"estimate $e")
  }

  test("linear-counting branch: 100 distinct estimated within 15%") {
    val (occ, e) = est(items(0, 100))
    assert(occ < 256L)
    assert(math.abs(e - 100.0) / 100.0 < 0.15, s"estimate $e")
  }

  test("duplicates leave registers unchanged") {
    val once = items(0, 500)
    val regsOnce = Cardinality.registers(once, col("s"))
    val regsTwice = Cardinality.registers(once.unionAll(once), col("s"))
    assert(regsOnce.exceptAll(regsTwice).isEmpty && regsTwice.exceptAll(regsOnce).isEmpty)
  }

  test("merge of shard sketches equals the sketch of the union, register-for-register") {
    val a = Cardinality.registers(items(0, 3000), col("s"))
    val b = Cardinality.registers(items(2000, 6000), col("s")) // overlapping shards
    val merged = Cardinality.merge(8, a, b)
    val whole = Cardinality.registers(items(0, 6000), col("s"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("empty input estimates zero") {
    val (occ, e) = est(items(0, 0))
    assert(occ == 0L && e == 0.0)
  }

  test("overlapMatrix: identical sources read jaccard 1.0; disjoint read near 0") {
    import spark.implicits._
    // a and b share the SAME 400-item universe; c is disjoint
    val rows =
      (0 until 400).map(i => ("a", s"t-$i")) ++
      (0 until 400).map(i => ("b", s"t-$i")) ++
      (0 until 400).map(i => ("c", s"u-$i"))
    val df = rows.toDF("src", "tok")
    val out = Cardinality.overlapMatrix(df, col("src"), col("tok"))
      .collect()
      .map(r => (r.getAs[String]("src_lo"), r.getAs[String]("src_hi")) -> r)
      .toMap
    assert(out.size == 3) // (a,b) (a,c) (b,c)
    val ab = out(("a", "b"))
    // identical sets: e_lo == e_hi == e_union exactly => jaccard exactly 1
    assert(ab.getAs[Double]("jaccard") == 1.0)
    assert(ab.getAs[Double]("e_union") == ab.getAs[Double]("e_lo"))
    val ac = out(("a", "c"))
    // disjoint sets: inclusion–exclusion reads ~0 within sketch error
    // (±6.5% per term at m=256), floored at 0 — never negative
    assert(ac.getAs[Double]("e_inter") >= 0.0)
    assert(ac.getAs[Double]("jaccard") < 0.2,
      s"disjoint jaccard too high: ${ac.getAs[Double]("jaccard")}")
    // union of disjoint sets estimates above either side
    assert(ac.getAs[Double]("e_union") > ac.getAs[Double]("e_lo"))
  }

  test("groupedEstimate with no keys equals estimate") {
    val regs = Cardinality.registers(items(0, 1000), col("s"))
    val a = Cardinality.estimate(regs).head()
    val b = Cardinality.groupedEstimate(regs, Nil).head()
    assert(a.getLong(0) == b.getLong(0) && a.getDouble(1) == b.getDouble(1))
  }
}
