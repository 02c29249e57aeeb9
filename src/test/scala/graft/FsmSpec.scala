package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{MultilineMode, MultilineSpec}
import graft.model.MultilineMode._
import graft.operators.Segments

/** Unit semantics of the multiline FSM — scenarios derived from the
  * reference behavior (internal/tailer/multline_reader.go:139-264 and its
  * test suite's shapes: 4 modes, StartPattern interplay, Java stack-trace
  * grouping, residual flush).
  */
class FsmSpec extends AnyFunSuite {

  private def run(spec: MultilineSpec, lines: Seq[String]): Seq[String] =
    Segments.runFsm(spec, lines.iterator).map(_._2).toSeq

  // ---- continuePast: matching lines accumulate; non-matching line is
  // included and closes the record.
  test("continuePast: non-matching line closes record inclusively") {
    val spec = MultilineSpec(ContinuePast, condPattern = "^\\s")
    val lines = Seq("start", "  cont1", "  cont2", "end", "next")
    // 'start' opens (empty buf), conts match, 'end' doesn't match => included+emit.
    // 'next' opens a new buf, flushed at end.
    assert(run(spec, lines) == Seq("start\n  cont1\n  cont2\nend", "next"))
  }

  test("continuePast: run of non-matching lines pairs up (empty-buf branch never closes)") {
    val spec = MultilineSpec(ContinuePast, condPattern = "^\\s")
    assert(run(spec, Seq("a", "b", "c", "d")) == Seq("a\nb", "c\nd"))
  }

  // ---- continueThrough: matching lines continue; non-matching closes and
  // starts the next record.
  test("continueThrough: java stack-trace grouping") {
    val spec = MultilineSpec(ContinueThrough, condPattern = "^\\s")
    val lines = Seq(
      "Exception in thread main",
      "  at com.example.Foo",
      "  at com.example.Bar",
      "INFO all good",
      "Exception again",
      "  at com.example.Baz")
    assert(run(spec, lines) == Seq(
      "Exception in thread main\n  at com.example.Foo\n  at com.example.Bar",
      "INFO all good",
      "Exception again\n  at com.example.Baz"))
  }

  test("Java preset (config.go:105-120 verbatim): start/cond patterns group a real trace") {
    val lines = Seq(
      "ERROR request failed",
      "Exception in thread \"main\" java.lang.IllegalStateException",
      "\tat com.example.Service.run(Service.java:42)",
      "Caused by: java.io.IOException: broken pipe",
      "\tat com.example.IO.write(IO.java:7)",
      "INFO recovered",
      "stray line")
    assert(run(MultilineSpec.Java, lines) == Seq(
      "ERROR request failed",
      "Exception in thread \"main\" java.lang.IllegalStateException" +
        "\n\tat com.example.Service.run(Service.java:42)" +
        "\nCaused by: java.io.IOException: broken pipe" +
        "\n\tat com.example.IO.write(IO.java:7)",
      "INFO recovered",
      "stray line"))
    assert(MultilineSpec.JavaTimeoutMs == 500L)
  }

  test("continueThrough + StartPattern: non-start closer emits standalone") {
    val spec = MultilineSpec(ContinueThrough, condPattern = "^\\s",
      startPattern = Some("^Exception"))
    val lines = Seq("noise", "Exception boom", "  at X", "plain", "  orphan cont")
    // 'noise': empty buf, not a start => standalone.
    // 'Exception boom' starts; '  at X' continues; 'plain' closes, is not a
    // start => standalone; '  orphan cont': empty buf, not a start => standalone.
    assert(run(spec, lines) == Seq(
      "noise", "Exception boom\n  at X", "plain", "  orphan cont"))
  }

  // ---- haltBefore: a matching line closes the previous record and starts a new one.
  test("haltBefore: header lines start records") {
    val spec = MultilineSpec(HaltBefore, condPattern = "^(INFO|CALL)")
    val lines = Seq("INFO a", "detail 1", "detail 2", "CALL b", "detail 3")
    assert(run(spec, lines) == Seq("INFO a\ndetail 1\ndetail 2", "CALL b\ndetail 3"))
  }

  test("haltBefore + StartPattern: matching non-start line emits standalone") {
    val spec = MultilineSpec(HaltBefore, condPattern = "^(INFO|CALL)",
      startPattern = Some("^INFO"))
    val lines = Seq("INFO a", "d1", "CALL b", "d2", "INFO c")
    // 'CALL b' matches cond: closes "INFO a\nd1", but is not a start => standalone.
    // 'd2': empty buf, not a start => standalone. 'INFO c' starts, flushed.
    assert(run(spec, lines) == Seq("INFO a\nd1", "CALL b", "d2", "INFO c"))
  }

  // ---- haltWith: a matching line is included and emits immediately.
  test("haltWith: terminator line closes inclusively") {
    val spec = MultilineSpec(HaltWith, condPattern = "END$")
    val lines = Seq("part1", "part2 END", "part3", "part4 END", "tail")
    assert(run(spec, lines) == Seq("part1\npart2 END", "part3\npart4 END", "tail"))
  }

  test("haltWith: all-matching lines pair up (empty-buf branch never closes)") {
    val spec = MultilineSpec(HaltWith, condPattern = ".")
    assert(run(spec, Seq("a", "b", "c")) == Seq("a\nb", "c"))
  }

  test("residual flush: trailing open buffer is emitted at end of batch") {
    val spec = MultilineSpec(ContinueThrough, condPattern = "^\\s")
    assert(run(spec, Seq("solo", "  cont")) == Seq("solo\n  cont"))
  }

  test("empty input emits nothing") {
    val spec = MultilineSpec(HaltBefore, condPattern = "^X")
    assert(run(spec, Seq.empty) == Seq.empty)
  }
}
