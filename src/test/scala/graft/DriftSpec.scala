package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Drift}

/** Pins the drift/fingerprint additions: TVD's exact-arithmetic identities
  * (zero for an identical distribution, 1 − overlap for disjoint ones),
  * snapshot-diff classification, and the winnowing guarantee (any shared
  * span of ≥ w+k−1 tokens yields a shared fingerprint; density stays near
  * 2/(w+1)). Exact cross-engine values are covered by the q_corpus_drift /
  * q_snapshot_diff / q_winnow_fp oracles.
  */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("tvd: a source identical to the corpus-wide mix scores 0") {
    // two sources with the SAME distribution => each equals the corpus
    val d = docs((1L, "a", "x x y"), (2L, "b", "x x y"))
    val out = Drift.tvdVsCorpus(d).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("tvd")).toMap
    assert(out == Map("a" -> 0.0, "b" -> 0.0))
  }

  test("kl: a source identical to the corpus mix scores exactly 0") {
    val d = docs((1L, "a", "x x y"), (2L, "b", "x x y"))
    val out = Drift.klVsCorpus(d).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("kl")).toMap
    assert(out == Map("a" -> 0.0, "b" -> 0.0))
  }

  test("kl: disjoint vocabularies read ln 2 under the micro-integer sum") {
    // source a = {x,x}, b = {y,y}: every present word has p_s = 1,
    // p_c = 1/2 => each source's KL = ln 2 (one micro-truncated term)
    val d = docs((1L, "a", "x x"), (2L, "b", "y y"))
    val out = Drift.klVsCorpus(d).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("kl_micros"), r.getAs[Double]("kl"))).toMap
    val lnTwoMicros = math.floor(
      (1.0 * math.log((2.0 * 4.0) / (2.0 * 2.0))) * 1e6 + 0.5).toLong
    assert(out("a") == ((lnTwoMicros, lnTwoMicros / 1e6)))
    assert(out("b") == out("a"))
    val row = Drift.klVsCorpus(d).filter(col("source") === "a").head()
    assert(row.getAs[Long]("n_tokens") == 2L && row.getAs[Long]("n_vocab") == 1L)
  }

  test("tvd: disjoint vocabularies give 1 - own-weight") {
    // source a = {x,x}, source b = {y,y}: corpus = {x:2, y:2}
    // TVD(a) = ½(|1 − ½| + |0 − ½|) = ½
    val d = docs((1L, "a", "x x"), (2L, "b", "y y"))
    val out = Drift.tvdVsCorpus(d).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("tvd")).toMap
    assert(out("a") == 0.5 && out("b") == 0.5)
    val row = Drift.tvdVsCorpus(d).filter(col("source") === "a").head()
    assert(row.getAs[Long]("n_tokens") == 2L && row.getAs[Long]("n_vocab") == 1L)
  }

  test("snapshotDiff classifies all four statuses") {
    val a = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("doc_id", "text")
    val b = Seq((1L, "one"), (2L, "TWO CHANGED"), (4L, "four")).toDF("doc_id", "text")
    val out = Drift.snapshotDiff(a, b, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("vocabGrowth: first-seen partitions the vocabulary, cumsum is total") {
    val d = Seq((0L, "a b"), (1L, "b c"), (2L, "a d")).toDF("doc_id", "text")
    val out = Drift.vocabGrowth(d, nBatches = 2).orderBy("batch").collect()
    // batch 0 = docs {0,2}: tokens a b a d; batch 1 = doc 1: b c
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 2L))
    assert(out.map(_.getAs[Long]("n_distinct")).toSeq == Seq(3L, 2L))
    assert(out.map(_.getAs[Long]("n_new")).toSeq == Seq(3L, 1L)) // c is new
    assert(out.map(_.getAs[Long]("vocab_cum")).toSeq == Seq(3L, 4L))
    // n_new partitions the global vocabulary exactly
    assert(out.map(_.getAs[Long]("n_new")).sum == 4L)
  }

  private val span = "alpha beta gamma delta epsilon zeta eta" // 7 tokens = w+k-1
  private def wdocs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("winnow guarantee: a shared span of w+k-1 tokens is always detected") {
    val d = wdocs(
      (1L, "one two three four five six " + span + " seven eight nine ten"),
      (2L, "red green blue cyan magenta " + span + " yellow black white grey"),
      (3L, "p q r s t u v w x y z aa bb cc dd ee ff gg hh ii"))
    val out = Dedup.winnowCoverage(d, "doc_id", "text", k = 4, w = 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    assert(out(1L) >= 1L && out(2L) >= 1L, "shared span must be fingerprinted")
    assert(out(3L) == 0L, "disjoint doc shares nothing")
  }

  test("winnow: short docs (< w+k-1 tokens) are excluded, density bounded") {
    val d = wdocs((1L, "a b c d e f"), // 6 tokens -> 3 kgrams < w
      (2L, "a b c d e f g h i j k l m n o p q r s t"))
    val rows = Dedup.winnowCoverage(d, "doc_id", "text", k = 4, w = 4).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(2L))
    val r = rows.head
    assert(r.getAs[Long]("n_kgrams") == 17L)
    assert(r.getAs[Long]("n_selected") <= r.getAs[Long]("n_kgrams"))
    assert(r.getAs[Double]("density") > 0.0 && r.getAs[Double]("density") <= 1.0)
  }

  test("bm25: more occurrences of a rarer term rank higher") {
    val d = Seq(
      (1L, "alpha alpha alpha beta filler filler filler filler"),
      (2L, "alpha beta filler filler filler filler filler filler"),
      (3L, "beta filler filler filler filler filler filler filler"),
      (4L, "filler filler filler filler filler filler filler filler"))
      .toDF("doc_id", "text")
    val out = graft.operators.Search.bm25(d, Seq("alpha", "beta"), topK = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
    // doc 4 has neither term: absent; tf ordering: 1 > 2 > 3
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out(0)._2 > out(1)._2 && out(1)._2 > out(2)._2)
    assert(out.forall(_._2 > 0.0))
  }

  test("bm25: length normalization — same tf, shorter doc scores higher") {
    val d = Seq(
      (1L, "term one two three"),
      (2L, "term one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val out = graft.operators.Search.bm25(d, Seq("term"), topK = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
  }

  test("winnow fingerprints are position-robust: prefix shift keeps overlap") {
    val long = "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 k11 k12 k13 k14 k15 k16"
    val d = wdocs((1L, long), (2L, "zz yy xx ww vv " + long))
    val out = Dedup.winnowCoverage(d, "doc_id", "text", k = 4, w = 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    assert(out(1L) >= 1L && out(2L) >= 1L)
  }
}
