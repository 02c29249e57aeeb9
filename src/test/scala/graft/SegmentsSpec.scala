package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{MultilineSpec, MultilineMode}
import graft.model.MultilineMode._
import graft.operators.Segments
import graft.sources.Transcripts

/** Distributed segment assembly vs the single-threaded FSM model, plus the
  * window≡FSM equivalence for the two Markovian modes.
  */
class SegmentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Random multi-conversation fixture; seeded, includes blanks/indents. */
  private def randomTurns(seed: Long, convs: Int, maxTurns: Int): Seq[(String, Int, String)] = {
    val rnd = new Random(seed)
    val vocab = Seq("INFO step", "CALL tool=x", "ask about", "  at frame", "", "plain text", "END")
    (0 until convs).flatMap { c =>
      val n = 1 + rnd.nextInt(maxTurns)
      (0 until n).map { t =>
        val base = vocab(rnd.nextInt(vocab.size))
        (f"conv-$c%04d", t, if (base.isEmpty) "" else s"$base ${rnd.nextInt(50)}")
      }
    }
  }

  private def fsmExpected(spec: MultilineSpec, rows: Seq[(String, Int, String)]): Set[(String, Int, String)] =
    rows.groupBy(_._1).flatMap { case (conv, turns) =>
      Segments.runFsm(spec, turns.sortBy(_._2).map(_._3).iterator)
        .map { case (i, r) => (conv, i, r) }
    }.toSet

  test("assembleFsm matches the single-threaded model across all 4 modes and start patterns") {
    val rows = randomTurns(seed = 42, convs = 30, maxTurns = 25)
    val df = rows.toDF("conv_id", "turn_idx", "text")
    val specs = Seq(
      MultilineSpec(ContinuePast, "^\\s"),
      MultilineSpec(ContinueThrough, "^\\s"),
      MultilineSpec(HaltBefore, "^(INFO|CALL|ask)"),
      MultilineSpec(HaltWith, "END"),
      MultilineSpec(ContinueThrough, "^\\s", startPattern = Some("^(INFO|CALL)")),
      MultilineSpec(HaltBefore, "^(INFO|CALL)", startPattern = Some("^INFO")))
    specs.foreach { spec =>
      val got = Segments.assembleFsm(df, spec, partitions = 5)
        .as[(String, Int, String, Int)].collect()
        .map(r => (r._1, r._2, r._3)).toSet
      assert(got == fsmExpected(spec, rows), s"mode=$spec")
    }
  }

  test("window formulation equals FSM for ContinueThrough and HaltBefore") {
    val rows = randomTurns(seed = 7, convs = 40, maxTurns = 20)
    val df = rows.toDF("conv_id", "turn_idx", "text")
    Seq(
      (ContinueThrough: MultilineMode, "^(INFO|CALL|ask)"),
      (HaltBefore: MultilineMode, "^(INFO|CALL|ask)")
    ).foreach { case (mode, re) =>
      val win = Segments.assembleWindow(df, mode, re)
        .select("conv_id", "record_idx", "record", "n_lines")
        .as[(String, Int, String, Int)].collect().toSet
      val fsm = Segments.assembleFsm(df, MultilineSpec(mode, re), partitions = 3)
        .as[(String, Int, String, Int)].collect().toSet
      assert(win == fsm, s"mode=$mode")
    }
  }

  test("mega-conversation skew: ordering invariant holds under repartition") {
    // one 5k-turn conversation among 50 small ones
    val df = Transcripts.synthesize(spark, numConvs = 50, turnsPerConv = 8,
      megaTurns = 5000, numPartitions = 8).toDF()
    val spec = MultilineSpec(HaltBefore, "^(INFO|CALL|ask)")
    val got = Segments.assembleFsm(df, spec, partitions = 8)
    val rows = df.select("conv_id", "turn_idx", "text")
      .as[(String, Int, String)].collect().toSeq
    val expected = fsmExpected(spec, rows)
    assert(got.as[(String, Int, String, Int)].collect()
      .map(r => (r._1, r._2, r._3)).toSet == expected)
    // total line conservation: sum of n_lines == input rows
    val totalLines = got.agg(sum("n_lines")).as[Long].head()
    assert(totalLines == rows.size)
  }
}
