package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Pins the content-defined chunking invariants: chunks tile the token
  * stream exactly, boundaries depend on content only (shift-robustness —
  * a prepended preamble leaves every chunk after the first realigned
  * boundary byte-identical), short texts collapse to one chunk, and the
  * keep-first dup accounting + source matrix aggregate correctly. Exact
  * cross-engine values are covered by the q_cdc_* / q_source_dup_matrix
  * oracles.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
    "one two three four five six seven eight nine ten eleven twelve"

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("chunks tile the token stream: sizes sum to token count, in order") {
    val out = Dedup.cdcChunks(docs((1L, base)), "doc_id", "text", w = 3, d = 4L)
      .orderBy("chunk_idx").collect()
    val nTok = base.split("\\s+").length
    assert(out.map(_.getAs[Int]("n_tok")).sum == nTok)
    assert(out.map(_.getAs[Int]("chunk_idx")).toSeq == out.indices.toSeq)
    assert(out.forall(_.getAs[Int]("n_tok") >= 1))
  }

  test("shift-robustness: chunk hashes realign after a prepended preamble") {
    val orig = Dedup.cdcChunks(docs((1L, base)), "doc_id", "text", w = 3, d = 4L)
      .orderBy("chunk_idx").collect().map(_.getAs[Long]("chunk_hash"))
    val shifted = Dedup.cdcChunks(
        docs((2L, "some inserted prefix " + base)), "doc_id", "text", w = 3, d = 4L)
      .orderBy("chunk_idx").collect().map(_.getAs[Long]("chunk_hash"))
    // every original chunk except possibly those overlapping the first
    // (pre-realignment) region reappears verbatim in the shifted doc
    val shared = orig.toSet.intersect(shifted.toSet)
    assert(shared.size >= orig.length - 1,
      s"expected all but at most 1 of ${orig.length} chunks shared, got ${shared.size}")
    // and the SUFFIX of the chunk sequences is identical, not just the set
    val k = math.min(orig.length, shifted.length) - 1
    assert(orig.takeRight(k).toSeq == shifted.takeRight(k).toSeq)
  }

  test("texts shorter than the window are a single chunk") {
    val out = Dedup.cdcChunks(docs((1L, "just two")), "doc_id", "text", w = 3, d = 4L)
      .collect()
    assert(out.length == 1 && out.head.getAs[Int]("n_tok") == 2)
  }

  test("cdcDedup: identical docs — second is fully duplicate, first fully unique") {
    val out = Dedup.cdcDedup(docs((1L, base), (2L, base)), "doc_id", "text",
        w = 3, d = 4L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_dup_chunks") == 0L)
    assert(out(1L).getAs[Double]("dup_frac") == 0.0)
    assert(out(2L).getAs[Long]("n_dup_chunks") == out(2L).getAs[Long]("n_chunks"))
    assert(out(2L).getAs[Double]("dup_frac") == 1.0)
  }

  test("cdcDedup: repeated chunk within one doc counts as dup (keep-first)") {
    val rep = base + " " + base // the whole text twice
    val out = Dedup.cdcDedup(docs((1L, rep)), "doc_id", "text", w = 3, d = 4L)
      .collect().head
    assert(out.getAs[Long]("n_dup_chunks") >= 1L)
    assert(out.getAs[Double]("dup_frac") > 0.0)
  }

  test("sourceDupMatrix: canonical ordering, counts, exact micro sums") {
    val pairs = Seq((1L, 2L, 0.75), (2L, 3L, 0.5), (4L, 5L, 1.0))
      .toDF("a", "b", "jaccard")
    val dim = Seq((1L, "web"), (2L, "books"), (3L, "web"), (4L, "web"), (5L, "web"))
      .toDF("id", "source")
    val out = Dedup.sourceDupMatrix(pairs, dim)
      .collect().map(r => (r.getAs[String]("src_lo"), r.getAs[String]("src_hi")) -> r)
      .toMap
    // (1,2) and (2,3) both fold to (books, web); (4,5) is (web, web)
    assert(out(("books", "web")).getAs[Long]("n_pairs") == 2L)
    assert(out(("books", "web")).getAs[Long]("j_micros") == 1250000L)
    assert(out(("books", "web")).getAs[Double]("mean_jaccard") == 0.625)
    assert(out(("web", "web")).getAs[Long]("n_pairs") == 1L)
    assert(out(("web", "web")).getAs[Double]("mean_jaccard") == 1.0)
    assert(out.size == 2)
  }
}
