package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{MultilineMode, MultilineSpec}
import graft.model.MultilineMode._

/** Multiline record assembly — the reference's 4-mode stateful line folder
  * (internal/tailer/multline_reader.go:139-264) re-expressed for Spark.
  *
  * Two formulations behind one semantic:
  *
  *  1. [[assembleFsm]] — exact: repartition by conv_id, sort within
  *     partitions by (conv_id, turn_idx), run the FSM per conversation in
  *     `mapPartitions`. Handles all 4 modes + StartPattern standalone
  *     emission. One shuffle; conversations never split across partitions.
  *
  *  2. [[assembleWindow]] — declarative: for the 4 modes *without*
  *     StartPattern, the record boundary is a pure function of the current
  *     and previous line, so a window `sum(boundary) over (partition by
  *     conv_id order by turn_idx)` yields the segment id; fully
  *     Catalyst-optimizable and DuckDB-oracle-expressible.
  *
  * End-of-batch behavior: the final open buffer is always flushed —
  * the reference's ReadOnce residual flush (tail_reader.go:229-249).
  */
object Segments {

  /** Transcript row with per-line metadata carried through FSM assembly. */
  final case class MetaRow(conv_id: String, turn_idx: Int, text: String,
      role: String, tool: String, ts: java.sql.Timestamp, src_file: String)

  /** Pure single-conversation FSM, shared by `assembleFsm` and the
    * ScalaTest/ScalaCheck property suite. Input lines in turn order;
    * output = completed records, each = lines joined with '\n'.
    */
  final class Fsm(spec: MultilineSpec) {
    private val condRe = spec.condPattern.r
    private val startRe = spec.startPattern.map(_.r)
    private val buf = mutable.ArrayBuffer.empty[String]
    private val out = mutable.ArrayBuffer.empty[String]

    private def matches(re: scala.util.matching.Regex, s: String): Boolean =
      re.findFirstIn(s).isDefined

    private def emitBuf(): Unit =
      if (buf.nonEmpty) { out += buf.mkString("\n"); buf.clear() }

    private def standalone(line: String): Unit = out += line

    def write(line: String): Unit = {
      if (buf.isEmpty) {
        startRe match {
          case Some(re) =>
            if (matches(re, line)) buf += line
            else standalone(line)
          case None => buf += line
        }
        return
      }
      val m = matches(condRe, line)
      spec.mode match {
        case ContinuePast =>
          buf += line
          if (!m) emitBuf()
        case ContinueThrough =>
          if (m) buf += line
          else {
            emitBuf()
            startRe match {
              case Some(re) =>
                if (matches(re, line)) buf += line else standalone(line)
              case None => buf += line
            }
          }
        case HaltBefore =>
          if (m) {
            emitBuf()
            startRe match {
              case Some(re) =>
                if (matches(re, line)) buf += line else standalone(line)
              case None => buf += line
            }
          } else buf += line
        case HaltWith =>
          buf += line
          if (m) emitBuf()
      }
    }

    /** Residual flush (multline_reader.go:279-285). */
    def flush(): Seq[String] = { emitBuf(); val r = out.toSeq; out.clear(); r }

    /** Drain records completed so far without flushing the open buffer. */
    def drain(): Seq[String] = { val r = out.toSeq; out.clear(); r }

    /** Open-buffer snapshot/restore — lets the FSM resume across streaming
      * micro-batches (the buffer is the only carried state).
      */
    def bufferLines: Seq[String] = buf.toSeq
    def restoreBuffer(lines: Seq[String]): Unit = { buf.clear(); buf ++= lines }
  }

  /** Run one conversation's lines (already in turn order) through the FSM,
    * returning (record_idx, record) pairs including the end-of-batch flush.
    */
  def runFsm(spec: MultilineSpec, lines: Iterator[String]): Iterator[(Int, String)] = {
    val fsm = new Fsm(spec)
    lines.foreach(fsm.write)
    fsm.flush().iterator.zipWithIndex.map { case (r, i) => (i, r) }
  }

  /** Exact formulation: one hash shuffle on conv_id, in-partition sort,
    * per-conversation FSM. Output: (conv_id, record_idx, record, n_lines).
    */
  def assembleFsm(df: DataFrame, spec: MultilineSpec, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    df.select("conv_id", "turn_idx", "text")
      .repartition(parts, col("conv_id"))
      .sortWithinPartitions("conv_id", "turn_idx")
      .as[(String, Int, String)]
      .mapPartitions { it =>
        // fully streaming: records emit as soon as the FSM closes them, so
        // per-task memory is O(open buffer), not O(records per conversation)
        // — a 10^7-turn mega-conversation costs only its largest record
        new Iterator[(String, Int, String, Int)] {
          private val in = it.buffered
          private var conv: String = _
          private var fsm: Fsm = _
          private var idx = 0
          private var pending: Iterator[String] = Iterator.empty
          private def refill(): Unit = {
            while (pending.isEmpty && (fsm != null || in.hasNext)) {
              if (fsm == null) { conv = in.head._1; fsm = new Fsm(spec); idx = 0 }
              if (in.hasNext && in.head._1 == conv) {
                fsm.write(in.next()._3)
                pending = fsm.drain().iterator
              } else { // conversation exhausted: residual flush, then close
                pending = fsm.flush().iterator
                fsm = null
              }
            }
          }
          def hasNext: Boolean = { refill(); pending.hasNext }
          def next(): (String, Int, String, Int) = {
            refill()
            val r = pending.next()
            val out = (conv, idx, r, r.count(_ == '\n') + 1)
            idx += 1
            out
          }
        }
      }
      .toDF("conv_id", "record_idx", "record", "n_lines")
  }

  /** [[assembleFsm]] variant that carries row metadata through assembly:
    * each record inherits role/tool/ts/src_file from its FIRST line.
    * Emitted records always consume the oldest pending lines (standalone
    * emission only happens on an empty buffer), so a FIFO of line metas
    * aligns with drained records. Output keeps the transcript shape with
    * `turn_idx` = record index and `text` = assembled record, so the
    * parse→enrich→route stages compose on top unchanged.
    */
  def assembleFsmRows(df: DataFrame, spec: MultilineSpec, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    df.select(col("conv_id"), col("turn_idx"), col("text"), col("role"),
        col("tool"), col("ts").cast("timestamp").as("ts"), col("src_file"))
      .as[MetaRow]
      .repartition(parts, col("conv_id"))
      .sortWithinPartitions("conv_id", "turn_idx")
      .mapPartitions { it =>
        // streaming like assembleFsm: emitted records always consume the
        // oldest pending line metas, so memory is O(open buffer)
        new Iterator[MetaRow] {
          private val in = it.buffered
          private var conv: String = _
          private var fsm: Fsm = _
          private var idx = 0
          private val metas = new java.util.ArrayDeque[MetaRow]()
          private var pending: Iterator[String] = Iterator.empty
          private def emit(r: String): MetaRow = {
            val n = r.count(_ == '\n') + 1
            var first: MetaRow = null
            var i = 0
            while (i < n) { val m = metas.poll(); if (i == 0) first = m; i += 1 }
            val out = MetaRow(conv, idx, r, first.role, first.tool, first.ts, first.src_file)
            idx += 1
            out
          }
          private def refill(): Unit = {
            while (pending.isEmpty && (fsm != null || in.hasNext)) {
              if (fsm == null) {
                conv = in.head.conv_id; fsm = new Fsm(spec); idx = 0; metas.clear()
              }
              if (in.hasNext && in.head.conv_id == conv) {
                val row = in.next()
                metas.add(row)
                fsm.write(row.text)
                pending = fsm.drain().iterator
              } else {
                pending = fsm.flush().iterator
                fsm = null
              }
            }
          }
          def hasNext: Boolean = { refill(); pending.hasNext }
          def next(): MetaRow = { refill(); emit(pending.next()) }
        }
      }
      .toDF()
  }

  /** Declarative boundary column. Only `ContinueThrough` and `HaltBefore`
    * (without StartPattern) have lag-1-Markovian boundaries: in both, the
    * closing line itself starts the next record, so "row starts a record"
    * is a pure function of the current row (and first-ness). In
    * `ContinuePast`/`HaltWith` the closing line is *absorbed* into the
    * record, and the reference's empty-buffer branch
    * (multline_reader.go:147-169) never closes — making boundaries depend
    * on run-length parity (e.g. HaltWith over all-matching lines pairs
    * them up). Those two modes require the FSM formulation.
    */
  def boundaryCol(mode: MultilineMode, condRe: String): Column = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val m = col("text").rlike(condRe)
    val first = lag(col("text"), 1).over(w).isNull
    mode match {
      case ContinueThrough => first || !m // non-matching line starts a record
      case HaltBefore      => first || m  // matching line starts a record
      case other => throw new IllegalArgumentException(
        s"$other boundaries are not lag-expressible; use assembleFsm")
    }
  }

  /** Window formulation (ContinueThrough/HaltBefore, no StartPattern):
    * segment id = running sum of boundaries; records = per-(conv, segment)
    * ordered concat. Matches [[assembleFsm]] exactly for these modes
    * (property-tested) and is DuckDB-oracle-expressible.
    */
  def assembleWindow(df: DataFrame, mode: MultilineMode, condRe: String): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select("conv_id", "turn_idx", "text")
      .withColumn("seg", sum(when(boundaryCol(mode, condRe), 1).otherwise(0)).over(w) - 1)
      .groupBy(col("conv_id"), col("seg").cast("int").as("record_idx"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("turn_idx"), col("text")))),
          s => s.getField("text")), "\n").as("record"),
        count(lit(1)).cast("int").as("n_lines"))
  }
}
