package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Parse, PathFilter}

/** Test vectors lifted verbatim from the reference's own unit suites, so
  * "matches the reference on its own tests" is pinned line-for-line:
  *
  *  - csv_test.go:92-142 (type detection, configured timestamp field)
  *  - dmesg_test.go:178-209 (real-world dmesg lines)
  *
  * plus a generative JVM↔Column parity check for PathFilter (the two
  * consumers of one compiled plan must never drift).
  */
class ReferenceParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("csv_test.go TypeDetection: 'hello,123,45.67,true,false,' typed cells") {
    val lines = Seq((1, "hello,123,45.67,true,false,")).toDF("n", "line")
    val t = Parse.csvTableTyped(lines, "line", "n", hasHeaders = false,
      customHeaders = Seq("str", "int", "float", "bool_true", "bool_false", "empty"),
      extraSlots = 0)
    val r = t.select(
      $"str_typed.kind", $"str_typed.str_v",
      $"int_typed.kind", $"int_typed.int_v",
      $"float_typed.kind", $"float_typed.float_v",
      $"bool_true_typed.bool_v", $"bool_false_typed.bool_v",
      $"empty_typed.kind", $"empty_typed.str_v").head()
    assert(r.getString(0) == "string" && r.getString(1) == "hello")
    assert(r.getString(2) == "int" && r.getLong(3) == 123L)
    assert(r.getString(4) == "float" && r.getDouble(5) == 45.67)
    assert(r.getBoolean(6) && !r.getBoolean(7))
    assert(r.getString(8) == "empty" && r.getString(9) == "")
  }

  test("csv_test.go TimestampParsing: configured field parses in the one configured format") {
    val lines = Seq((1, "2023-12-01 10:30:45,Test message")).toDF("n", "line")
    // csv_test.go:123-129 leaves AutoDetectTypes unset: cells stay strings,
    // so the configured-format parse is ungated (the type-assert gate only
    // exists when detection is on — csv.go:107,123-127)
    val t = Parse.csvTableTyped(lines, "line", "n", hasHeaders = false,
      customHeaders = Seq("timestamp", "message"), extraSlots = 0,
      timestampField = "timestamp", timestampFormat = "yyyy-MM-dd HH:mm:ss",
      autoDetectTypes = false)
    val parsed = t.select($"timestamp_parsed".cast("string")).as[String].head()
    assert(parsed == "2023-12-01 10:30:45") // session TZ is UTC
  }

  test("dmesg_test.go RealWorldExamples: message/ts/subsystem behavior") {
    val logs = Seq(
      "[    0.000000] Linux version 5.15.0-56-generic (buildd@lcy02-amd64-044)",
      "[    0.000000] Command line: BOOT_IMAGE=/boot/vmlinuz root=UUID=abc123",
      "[    1.234567] ACPI: Added _OSI(Module Device)",
      "[   10.123456] pci 0000:00:1f.3: [8086:a348] type 00 class 0x040300",
      "<6>[   20.000000] systemd[1]: Started Load Kernel Modules.",
      "<4>[   25.111111] thermal thermal_zone0: failed to read out thermal zone (-61)",
      "[  100.500000] docker0: port 1(veth123abc) entered blocking state")
    val out = Parse.dmesgParse(logs.zipWithIndex.map(_.swap).toDF("i", "line"), "line")
      .select("i", "dmesg_hit", "message", "ts_rel", "subsystem", "priority", "facility")
      .collect().sortBy(_.getInt(0))
    out.foreach { r =>
      assert(r.getBoolean(1), s"line ${r.getInt(0)} must parse")
      assert(r.getString(2).nonEmpty)
      assert(r.getDouble(3) >= 0.0)
    }
    assert(out(0).getString(4) == "kernel")   // "Linux version" heuristic
    assert(out(4).getString(4) == "systemd")
    assert(out(4).getInt(5) == 6 && out(4).getInt(6) == 0) // <6> = kernel/info
    assert(out(5).getString(4) == "thermal")
    assert(out(6).getString(4) == "docker0")  // interface name via subsystem regex
    assert(out(6).getDouble(3) == 100.5)
  }

  test("PathFilter: driver matcher and Column predicate agree on generated inputs") {
    val dirs = Set("/d", "/d/sub")
    val isDir: String => Boolean = dirs.contains
    val names = Seq("a.log", "b.txt", "c1.json", "x.log", "deep.yaml")
    val paths = for {
      base <- Seq("/d", "/d/sub", "/other"); n <- names
    } yield s"$base/$n"
    val patternPool = Seq("*.log", "*.txt", "c?.json", "[ab].*", "/d", "/d/sub/",
      "a.log", "/other/x.log", "*.y*", "missingdir/")
    val rnd = new scala.util.Random(42)
    val df = paths.toDF("p")
    for (_ <- 1 to 40) {
      val inc = rnd.shuffle(patternPool).take(rnd.nextInt(3))
      val exc = rnd.shuffle(patternPool).take(rnd.nextInt(2)).filter(PathFilter.hasMeta)
      val c = PathFilter.compile(inc, exc, isDir)
      val jvm = paths.filter(PathFilter.matches(c, _)).toSet
      val col_ = df.filter(PathFilter.column(c, col("p"))).as[String].collect().toSet
      assert(jvm == col_, s"drift for include=$inc exclude=$exc")
    }
  }
}
