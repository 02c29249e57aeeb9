package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

/** Pins the as-of join's operator invariants on hand-built timelines:
  * latest-at-or-before matching, strict mode excluding the equal-ts row,
  * left-join NULL for unmatched rows, deterministic max-payload tie at one
  * (key, ts), and the one-Exchange plan shape (no range-join explosion).
  * Exact cross-engine values (vs DuckDB's native ASOF JOIN) are covered by
  * the q_asof_attribution oracle.
  */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (key, t, id) fixtures — t as plain long keeps the pins arithmetic
  private def df(rows: (Long, Long, Long)*) =
    rows.toDF("k", "t", "id")

  test("each left row matches the latest right row at-or-before its ts") {
    val left = df((1L, 10L, 100L), (1L, 20L, 101L), (1L, 30L, 102L),
      (2L, 15L, 200L))
    val right = df((1L, 10L, 900L), (1L, 25L, 901L), (2L, 99L, 902L))
    val out = AsOf.asofJoin(left, right, "k", "t")
      .select(col("id"), col("asof").getField("id").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    // id 100 (t=10): right t=10 included by >=; id 101 (t=20): latest is
    // t=10; id 102 (t=30): latest is t=25; id 200: no right at-or-before
    assert(out == Map(100L -> Some(900L), 101L -> Some(900L),
      102L -> Some(901L), 200L -> None))
  }

  test("strict mode excludes the equal-ts right row") {
    val left = df((1L, 10L, 100L), (1L, 20L, 101L))
    val right = df((1L, 10L, 900L), (1L, 20L, 901L))
    val out = AsOf.asofJoin(left, right, "k", "t", strict = true)
      .select(col("id"), col("asof").getField("id").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(100L -> None, 101L -> Some(900L)))
  }

  test("right-side ties at one (key, ts) resolve to the payload max") {
    val left = df((1L, 50L, 100L))
    val right = df((1L, 40L, 901L), (1L, 40L, 903L), (1L, 40L, 902L))
    val out = AsOf.asofJoin(left, right, "k", "t")
      .select(col("asof").getField("id")).as[Long].collect().toSeq
    assert(out == Seq(903L))
  }

  test("plan shape: one exchange, no join node (no range explosion)") {
    val left = df((1L, 10L, 100L)); val right = df((1L, 5L, 900L))
    val plan = AsOf.asofJoin(left, right, "k", "t")
      .queryExecution.executedPlan.toString
    assert("(?i)exchange".r.findAllIn(plan).size == 1, plan)
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("contracts: matchedName collision and key/ts type mismatch rejected") {
    val l = df((1L, 1L, 1L)); val r = df((1L, 1L, 1L))
    intercept[IllegalArgumentException](
      AsOf.asofJoin(l.withColumnRenamed("id", "asof"), r, "k", "t"))
    intercept[IllegalArgumentException](
      AsOf.asofJoin(l, r.withColumn("t", col("t").cast("int")), "k", "t"))
  }
}
