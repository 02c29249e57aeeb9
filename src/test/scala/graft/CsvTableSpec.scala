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

  test("duplicated header-order rows are rejected, not silently dropped") {
    val lines = Seq((1, "name,age"), (1, "alice,30"), (2, "bob,25"))
      .toDF("line_num", "line")
    val e = intercept[IllegalArgumentException](
      Parse.csvTable(lines, "line", "line_num").collect())
    assert(e.getMessage.contains("header row must be unique"))
  }

  test("typed table: Go-precedence typed slots + configured ts companion") {
    val lines = Seq(
      (0, "id,flag,ts"),
      (1, "7,1,2024-01-02 03:04:05"),
      (2, "8,off,2024/01/02 03:04:05"),
      (3, "9,3.5,n/a"),
      (4, "10,, ")).toDF("line_num", "line")
    val t = Parse.csvTableTyped(lines, "line", "line_num", extraSlots = 0,
      timestampField = "ts", timestampFormat = "yyyy-MM-dd HH:mm:ss")
    val got = t.orderBy("line_num").select(
      $"id_typed.kind", $"id_typed.int_v",
      $"flag_typed.kind", $"flag_typed.bool_v", $"flag_typed.float_v", $"flag_typed.str_v",
      $"ts_typed.kind", $"ts_parsed".isNotNull)
      .as[(String, Long, String, Option[Boolean], Option[Double], String, String, Boolean)]
      .collect().toSeq
    assert(got == Seq(
      // row 1: auto-detected as timestamp → the reference's string
      // type-assert fails and _parsed is NEVER set (csv.go:119-127 quirk)
      ("int", 7L, "bool", Some(true), None, null, "timestamp", false),
      ("int", 8L, "bool", Some(false), None, null, "timestamp", false),
      ("int", 9L, "float", None, Some(3.5), null, "string", false),
      ("int", 10L, "empty", None, None, "", "empty", false)))
  }

  test("ts companion sets only for string-kind cells (the type-assert gate)") {
    // a layout OUTSIDE the auto-detect list: the value stays string-kind,
    // so the configured-format parse actually happens
    val lines = Seq(
      (0, "id,ts"),
      (1, "1,02.01.2024 03:04"),          // string kind, format parses
      (2, "2,2024-01-02 03:04:05"),       // timestamp kind → gated off
      (3, "3,n/a")).toDF("line_num", "line")
    val t = Parse.csvTableTyped(lines, "line", "line_num", extraSlots = 0,
      timestampField = "ts", timestampFormat = "dd.MM.yyyy HH:mm")
    val got = t.orderBy("line_num")
      .select($"ts_typed.kind", $"ts_parsed".cast("string"))
      .as[(String, Option[String])].collect().toSeq
    assert(got == Seq(
      ("string", Some("2024-01-02 03:04:00")),
      ("timestamp", None),
      ("string", None)))
  }

  test("exactDeduped keeps the lowest id per content and preserves schema") {
    val df = Seq((1L, "a"), (2L, "b"), (5L, "a"), (3L, "b"), (4L, "c"))
      .toDF("doc_id", "text")
    val out = Dedup.exactDeduped(df, "doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "a"), (2L, "b"), (4L, "c")))
  }
}
