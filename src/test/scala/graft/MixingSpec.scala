package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hashing
import graft.operators.Mixing

/** Pins the source-mixing sampler's operator invariants: deterministic
  * membership (a JVM replay of the hash ring predicts the exact survivor
  * set), rate-0 / rate-1000 edges, allowlist semantics for unknown
  * sources, shard-consistency of the blend, and rate validation. Exact
  * cross-engine values are covered by the q_mix_sources DuckDB oracle.
  */
class MixingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(n: Long) =
    spark.range(0, n).select(col("id"),
      concat(lit("s"), (col("id") % 4).cast("string")).as("src"))

  test("membership is the exact hash-ring predicate, per row") {
    val rates = Map("s0" -> 1000, "s1" -> 500, "s2" -> 250, "s3" -> 0)
    val kept = Mixing.mixBySource(corpus(2000), col("id"), col("src"), rates)
      .select("id").as[Long].collect().toSet
    val expected = (0L until 2000L).filter { id =>
      val r = rates(s"s${id % 4}")
      Hashing.sha60Jvm(s"mix:$id") % 1000 < r
    }.toSet
    assert(kept == expected)
    // rate 1000 keeps every s0 row; rate 0 keeps no s3 row
    assert((0L until 2000L by 4L).toSet.subsetOf(kept))
    assert(kept.forall(_ % 4 != 3))
  }

  test("blend is deterministic and composes across shards") {
    val rates = Map("s0" -> 700, "s1" -> 300, "s2" -> 900, "s3" -> 100)
    def ids(lo: Long, hi: Long) =
      Mixing.mixBySource(
          spark.range(lo, hi).select(col("id"),
            concat(lit("s"), (col("id") % 4).cast("string")).as("src")),
          col("id"), col("src"), rates)
        .select("id").as[Long].collect().toSet
    val whole = ids(0, 3000)
    assert(whole == ids(0, 3000))
    assert(whole == ids(0, 1100) ++ ids(1100, 3000))
  }

  test("sources absent from the rate table are dropped (allowlist)") {
    val kept = Mixing.mixBySource(corpus(400), col("id"), col("src"),
        Map("s0" -> 1000, "s1" -> 1000))
      .select("src").distinct().as[String].collect().toSet
    assert(kept == Set("s0", "s1"))
  }

  test("rates outside [0, 1000] and empty tables are rejected") {
    intercept[IllegalArgumentException] {
      Mixing.mixBySource(corpus(10), col("id"), col("src"), Map("s0" -> 1001))
    }
    intercept[IllegalArgumentException] {
      Mixing.mixBySource(corpus(10), col("id"), col("src"), Map("s0" -> -1))
    }
    intercept[IllegalArgumentException] {
      Mixing.mixBySource(corpus(10), col("id"), col("src"), Map.empty)
    }
  }

  test("epoch upsampling emits exactly floor(r/1000) + ring copies, 0-indexed") {
    // s0 at 2500: 2 copies always, 3 under the fractional ring; s1 at
    // 1000: exactly 1 copy each; s2 at 400: 0 or 1; s3 at 0: none
    val rates = Map("s0" -> 2500, "s1" -> 1000, "s2" -> 400, "s3" -> 0)
    val out = Mixing.mixWithEpochs(corpus(2000), col("id"), col("src"), rates)
      .select("id", "epoch").as[(Long, Int)].collect()
    val byId = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    for (id <- 0L until 2000L) {
      val r = rates(s"s${id % 4}")
      val copies = r / 1000 +
        (if (Hashing.sha60Jvm(s"mix:$id") % 1000 < r % 1000) 1 else 0)
      assert(byId.getOrElse(id, Seq.empty) == (0 until copies),
        s"id $id at rate $r")
    }
    // subsumes mixBySource at rates ≤ 1000: same survivors, all epoch 0
    val plain = Mixing.mixBySource(corpus(2000), col("id"), col("src"),
        rates.view.mapValues(math.min(_, 1000)).toMap.updated("s0", 1000))
      .select("id").as[Long].collect().toSet
    val epochs0 = Mixing.mixWithEpochs(corpus(2000), col("id"), col("src"),
        rates.view.mapValues(math.min(_, 1000)).toMap.updated("s0", 1000))
      .select("id").as[Long].collect().toSet
    assert(plain == epochs0)
  }

  test("per-source survival tracks the requested permille") {
    val rates = Map("s0" -> 800, "s1" -> 400, "s2" -> 200, "s3" -> 50)
    val got = Mixing.mixBySource(corpus(8000), col("id"), col("src"), rates)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    for ((s, r) <- rates) {
      val want = 2000.0 * r / 1000.0
      val g = got.getOrElse(s, 0L).toDouble
      assert(math.abs(g - want) < 2000 * 0.05,
        s"$s: kept $g of 2000 at rate $r permille")
    }
  }

  test("temperatureMix: sqrt rates up-weight the small source") {
    // big: 900 docs x 10 tokens, small: 100 docs x 10 tokens
    val rows = (0 until 900).map(i => (i.toLong, "big", "t " * 9 + "t")) ++
      (0 until 100).map(i => (1000L + i, "small", "t " * 9 + "t"))
    val df = spark.createDataFrame(rows).toDF("doc_id", "source", "text")
    val out = Mixing.temperatureMix(df, col("doc_id"), col("source"),
        col("text"), budgetPermille = 500).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // closed-form: c_big=9000, c_small=1000, B=5000;
    // q = sqrt(c)/ (sqrt(9000)+sqrt(1000)); rate = floor(B*1000*q/c)
    val sumSqrt = 0.0 + math.sqrt(1000.0) + math.sqrt(9000.0) // "big"<"small"
    def rate(c: Double) =
      math.min(1000.0, math.floor(5000L * 1000.0 *
        (math.sqrt(c) / sumSqrt) / c)).toInt
    val rBig = out("big").getAs[Int]("rate_permille")
    val rSmall = out("small").getAs[Int]("rate_permille")
    assert(rBig == rate(9000.0) && rSmall == rate(1000.0))
    // temperature flattening: small source keeps a HIGHER fraction
    assert(rSmall > rBig)
    assert(out("big").getAs[Long]("n_tokens") == 9000L)
    // outcome columns track the ring exactly (bounds: rate ± sampling)
    val sb = out("big").getAs[Long]("sampled_docs")
    assert(sb > 0 && sb < 900)
    assert(out("big").getAs[Long]("sampled_tokens") == sb * 10)
  }

  test("temperatureMix: uniform sources get uniform rates ~ budget") {
    val rows = (0 until 300).map(i => (i.toLong, s"s${i % 3}", "a b c d"))
    val df = spark.createDataFrame(rows).toDF("doc_id", "source", "text")
    val out = Mixing.temperatureMix(df, col("doc_id"), col("source"),
        col("text"), budgetPermille = 600).collect()
    // equal counts => identical rates ≈ budget permille for every source
    // (same closed form as the operator; here the float product lands
    // exactly on 240000.0, so the floor returns the full 600)
    val sumSqrt = 0.0 + math.sqrt(400.0) + math.sqrt(400.0) + math.sqrt(400.0)
    val want = math.min(1000.0, math.floor(
      (1200L * 600 / 1000) * 1000.0 * (math.sqrt(400.0) / sumSqrt) / 400.0)).toInt
    assert(out.map(_.getAs[Int]("rate_permille")).toSet == Set(want))
    assert(want == 600) // pinned so a closed-form drift shows up loudly
    assert(out.length == 3)
  }
}
