package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Parse}

/** CSV table parse with reference header semantics (csv.go:83-104) and the
  * keep-rows exact dedup.
  */
class CsvTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("headers from first line; quoted delimiters; extra_field overflow") {
    val lines = Seq(
      (1, "name,age,city"),
      (2, "alice,30,\"new york, ny\""),
      (3, "bob,25,paris,EXTRA"),
      (4, "carol,41,berlin")).toDF("line_num", "line")
    val out = Parse.csvTable(lines, "line", "line_num", extraSlots = 2)
    assert(out.columns.toSeq == Seq("line_num", "name", "age", "city", "extra_field_4", "extra_field_5"))
    val rows = out.orderBy("line_num")
      .as[(Int, String, String, String, String, String)].collect().toSeq
    assert(rows == Seq(
      (2, "alice", "30", "new york, ny", null, null),
      (3, "bob", "25", "paris", "EXTRA", null),
      (4, "carol", "41", "berlin", null, null)))
  }

  test("no headers: custom names, then generated names") {
    val lines = Seq((1, "x;1"), (2, "y;2")).toDF("line_num", "line")
    val named = Parse.csvTable(lines, "line", "line_num", delim = ";",
      hasHeaders = false, customHeaders = Seq("k", "v"), extraSlots = 0)
    assert(named.columns.toSeq == Seq("line_num", "k", "v"))
    assert(named.count() == 2)
    val generated = Parse.csvTable(lines, "line", "line_num", delim = ";",
      hasHeaders = false, customHeaders = Seq("", "v"), extraSlots = 0)
    assert(generated.columns.toSeq == Seq("line_num", "field_1", "v"))
  }

  test("exactDeduped keeps the lowest id per content and preserves schema") {
    val df = Seq((1L, "a"), (2L, "b"), (5L, "a"), (3L, "b"), (4L, "c"))
      .toDF("doc_id", "text")
    val out = Dedup.exactDeduped(df, "doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "a"), (2L, "b"), (4L, "c")))
  }
}
