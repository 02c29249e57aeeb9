package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.PipelineConfig
import graft.operators.PathFilter

/** S3 path include/exclude semantics, pinned against the reference's
  * matrix (internal/watcher/watcher_test.go:184-233 include/exclude cases,
  * watcher_test.go:150-163 overlap cases) plus Go filepath.Match behavior.
  */
class PathFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/watch"
  private val files = Seq("log1.txt", "log2.log", "data.json", "config.yaml")
    .map(f => s"$dir/$f")
  private val isDir: String => Boolean = _ == dir

  private def surviving(include: Seq[String], exclude: Seq[String]): Set[String] = {
    val c = PathFilter.compile(include, exclude, isDir)
    val jvm = files.filter(PathFilter.matches(c, _)).toSet
    val col_ = files.toDF("p")
      .filter(PathFilter.column(c, col("p"))).as[String].collect().toSet
    assert(jvm == col_, "driver matcher and Column must agree")
    jvm.map(_.split("/").last)
  }

  test("watcher matrix: include only log files") {
    assert(surviving(Seq(dir, "*.log"), Nil) == Set("log2.log"))
  }

  test("watcher matrix: exclude log files") {
    assert(surviving(Seq(dir), Seq("*.log")) ==
      Set("log1.txt", "data.json", "config.yaml"))
  }

  test("watcher matrix: include txt and log, exclude json") {
    assert(surviving(Seq(dir, "*.txt", "*.log"), Seq("*.json")) ==
      Set("log1.txt", "log2.log"))
  }

  test("broad dir include admits subtree only when no specific includes") {
    assert(surviving(Seq(dir), Nil) == files.map(_.split("/").last).toSet)
    // exact-file include: matches by basename or full path
    assert(surviving(Seq(s"$dir/log1.txt"), Nil) == Set("log1.txt"))
    assert(surviving(Seq("data.json"), Nil) == Set("data.json"))
    // empty include admits all
    assert(surviving(Nil, Nil) == files.map(_.split("/").last).toSet)
  }

  test("glob semantics are Go filepath.Match: * and ? stop at /, classes work") {
    def m(pat: String, s: String): Boolean = s.matches(PathFilter.globToRegex(pat))
    assert(m("*.log", "a.log") && !m("*.log", "d/a.log"))
    assert(m("log?.txt", "log1.txt") && !m("log?.txt", "log12.txt"))
    assert(m("log[0-9].txt", "log7.txt") && !m("log[0-9].txt", "logx.txt"))
    assert(m("log[^0-9].txt", "logx.txt") && !m("log[^0-9].txt", "log7.txt"))
    assert(m("/var/log/*.log", "/var/log/sys.log") && !m("/var/log/*.log", "/var/log/d/sys.log"))
    assert(m("a\\*b", "a*b") && !m("a\\*b", "axb"))
    assert(m("a.b", "a.b") && !m("a.b", "axb")) // '.' is literal
    // escaped ']' inside a class does not terminate it (Go getEsc), and
    // class-body escapes are unescaped before re-escaping for the regex
    assert(m("a[\\]]b", "a]b") && !m("a[\\]]b", "a\\b"))
    assert(m("a[x\\]y]b", "a]b") && m("a[x\\]y]b", "ayb") && !m("a[x\\]y]b", "azb"))
    assert(m("f[\\^]g", "f^g") && !m("f[\\^]g", "fxg"))
    // an ESCAPED '-' in a class is the literal '-' (Go strips the escape
    // before the range check), never a range operator
    assert(m("file[a\\-c].log", "filea.log") && m("file[a\\-c].log", "file-.log")
      && m("file[a\\-c].log", "filec.log") && !m("file[a\\-c].log", "fileb.log"))
    // unescaped '-' still forms a range
    assert(m("file[a-c].log", "fileb.log") && !m("file[a-c].log", "file-.log"))
    intercept[IllegalArgumentException](PathFilter.globToRegex("bad["))
    intercept[IllegalArgumentException](PathFilter.globToRegex("bad[\\"))
    // Go getEsc: a class starting with an UNESCAPED ']' is ErrBadPattern —
    // "a[]]b" does not parse as a class containing ']' (write "a[\]]b")
    intercept[IllegalArgumentException](PathFilter.globToRegex("a[]]b"))
    intercept[IllegalArgumentException](PathFilter.globToRegex("a[^]]b"))
    // ... as is any unescaped '-' outside a lo-hi range (Go's class
    // grammar; the literal needs the "[a\-c]" escape)
    intercept[IllegalArgumentException](PathFilter.globToRegex("a[-b]c"))
    intercept[IllegalArgumentException](PathFilter.globToRegex("a[b-]c"))
    intercept[IllegalArgumentException](PathFilter.globToRegex("a[x-y-z]c"))
    intercept[IllegalArgumentException](PathFilter.globToRegex("a[x--y]c"))
    // two adjacent ranges ARE legal ("[a-cx-z]")
    assert(m("f[a-cx-z]g", "fbg") && m("f[a-cx-z]g", "fyg") && !m("f[a-cx-z]g", "fmg"))
  }

  test("clean and glob-root derivation") {
    assert(PathFilter.clean("/a//b/./c/") == "/a/b/c")
    assert(PathFilter.clean("a/../b") == "b")
    assert(PathFilter.clean("") == ".")
    assert(PathFilter.deriveGlobRoot("/var/log/*.log") == "/var/log")
    assert(PathFilter.deriveGlobRoot("logs/**/*.txt") == "logs")
    assert(PathFilter.deriveGlobRoot("*.log") == ".")
    // PINNED DIVERGENCE: the reference's TrimSuffix loop returns "." for a
    // root-level glob (util.go:25-56); "/" is the correct walk root for an
    // absolute pattern — "." would silently scan the process CWD
    assert(PathFilter.deriveGlobRoot("/*.log") == "/")
    assert(PathFilter.deriveScanRoots(Seq("/var/log/*.log", "/var/log/x*"),
      _ => false) == Seq("/var/log"))
    assert(PathFilter.deriveScanRoots(Nil, _ => false) == Seq("."))
  }

  test("overlap validation mirrors NewWatcher: nested roots rejected, duplicates fine") {
    val dirs = Set("/tmp/logs", "/var/logs", "/opt/logs", "/tmp/logs/app")
    val isD: String => Boolean = dirs.contains
    assert(PathFilter.validateRoots(Seq("/tmp/logs", "/var/logs", "/opt/logs"), isD).isRight)
    assert(PathFilter.validateRoots(Seq("/tmp/logs", "/tmp/logs/app"), isD).isLeft)
    assert(PathFilter.validateRoots(Seq("/tmp/logs", "/tmp/logs"), isD).isRight)
    // config validation surfaces the same error
    assert(PipelineConfig(include = Seq("/tmp/logs", "/tmp/logs/app")).validate(isD).isLeft)
    assert(PipelineConfig(include = Seq("/tmp/logs")).validate(isD).isRight)
  }
}
