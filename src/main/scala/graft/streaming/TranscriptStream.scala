package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.model.{MultilineSpec, Turn}
import graft.operators.{Parse, Route, Segments}

/** Structured Streaming flavor of the engine — the "tail -f" capability the
  * batch pipeline supplies via resumable runs, expressed natively:
  * `readStream` → the same stateless parse/route stages → watermarked
  * windowed aggregates, plus a stateful multiline assembler via
  * `flatMapGroupsWithState` whose carried state is exactly the FSM's open
  * buffer (the reference's MultilineReader.buf,
  * internal/tailer/multline_reader.go:28).
  */
object TranscriptStream {

  /** Per-conversation streaming FSM state: the open buffer + next record idx. */
  final case class SegState(buf: List[String], nextIdx: Int, lastTurn: Int)

  final case class SegRecord(conv_id: String, record_idx: Int, record: String)

  /** The stateless stages compose unchanged onto a streaming DataFrame —
    * parse and route are pure row transforms.
    */
  def parseAndRoute(stream: DataFrame): DataFrame =
    Route.routed(Parse.parseTurns(stream))

  /** Watermarked per-window per-tool usage counts (A5/A6 metric analogue in
    * motion): 10-minute event-time windows, 30-minute lateness bound.
    */
  def windowedToolUsage(stream: DataFrame): DataFrame =
    stream
      .filter(col("tool") =!= "")
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("tool"))
      .agg(count(lit(1)).as("n_calls"))
      .select(col("window.start").as("w_start"), col("tool"), col("n_calls"))

  /** Stateful multiline assembly over a stream of turns: one group per
    * conversation; within each micro-batch the group's rows are sorted by
    * turn_idx (cross-batch order is arrival order, as with a live tail).
    * Completed records are emitted append-mode; the open buffer rides in
    * GroupState until a later batch closes it — exactly the reference's
    * "no flush until the record closes" semantics. No wall-clock flush:
    * exactly-once, but an abandoned conversation never emits its tail —
    * pair with [[assembleStreamIdleFlush]] when A2 semantics are wanted.
    *
    * OPERATING CONSTRAINT (sizing, not correctness): `it.toSeq.sortBy`
    * materializes ONE conversation's rows from ONE micro-batch in task
    * memory. At tail rates (the reference's regime — a poll interval of
    * new lines per file) that is bytes-to-kilobytes. Do NOT replay a
    * historical backfill through this path: a mega-conversation arriving
    * in a single batch would buffer whole; backfills belong to the batch
    * formulation ([[graft.operators.Segments.assembleFsm]]), whose
    * iterator holds only the open buffer regardless of input size.
    */
  def assembleStream(turns: Dataset[Turn], spec: MultilineSpec): Dataset[SegRecord] = {
    import turns.sparkSession.implicits._
    turns.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (conv: String, it: Iterator[Turn], state: GroupState[SegState]) =>
          val st = state.getOption.getOrElse(SegState(Nil, 0, -1))
          val fsm = new Segments.Fsm(spec)
          fsm.restoreBuffer(st.buf)
          val sorted = it.toSeq.filter(_.turn_idx > st.lastTurn).sortBy(_.turn_idx)
          sorted.foreach(t => fsm.write(t.text))
          val recs = fsm.drain()
          val lastTurn = sorted.lastOption.map(_.turn_idx).getOrElse(st.lastTurn)
          state.update(SegState(fsm.bufferLines.toList, st.nextIdx + recs.size, lastTurn))
          recs.iterator.zipWithIndex.map { case (r, i) =>
            SegRecord(conv, st.nextIdx + i, r)
          }
      }
  }

  /** [[assembleStream]] plus the reference's A2 idle-timeout flush
    * (internal/tailer/multline_reader.go:74-114): a conversation idle past
    * `idleTimeoutMs` flushes its open buffer as a (possibly partial)
    * record. This is explicitly an AT-LEAST-ONCE window (README.md:250-262):
    * lines arriving after the flush start a fresh record, so a consumer
    * may see one logical record split in two.
    *
    * Expressed with Spark 4's `transformWithState` (the modern stateful
    * API) because its timers are first-class: one processing-time timer
    * per conversation, re-armed on every data batch, flushes on expiry.
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`).
    */
  def assembleStreamIdleFlush(turns: Dataset[Turn], spec: MultilineSpec,
      idleTimeoutMs: Long): Dataset[SegRecord] = {
    import turns.sparkSession.implicits._
    turns.groupByKey(_.conv_id)
      .transformWithState(new SegmentProcessor(spec, idleTimeoutMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Per-conversation FSM as a StatefulProcessor: state = open buffer +
    * record cursor (SegState, same as the GroupState flavor); one idle
    * timer per key.
    */
  final class SegmentProcessor(spec: MultilineSpec, idleTimeoutMs: Long)
      extends StatefulProcessor[String, Turn, SegRecord] {
    @transient private var st: ValueState[SegState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SegState]("seg",
        Encoders.product[SegState], TTLConfig.NONE)

    private def current: SegState =
      if (st.exists()) st.get() else SegState(Nil, 0, -1)

    override def handleInputRows(conv: String, it: Iterator[Turn],
        timerValues: TimerValues): Iterator[SegRecord] = {
      val cur = current
      val fsm = new Segments.Fsm(spec)
      fsm.restoreBuffer(cur.buf)
      val sorted = it.toSeq.filter(_.turn_idx > cur.lastTurn).sortBy(_.turn_idx)
      sorted.foreach(t => fsm.write(t.text))
      val recs = fsm.drain()
      val lastTurn = sorted.lastOption.map(_.turn_idx).getOrElse(cur.lastTurn)
      st.update(SegState(fsm.bufferLines.toList, cur.nextIdx + recs.size, lastTurn))
      // re-arm the idle timer: data arrived, so the clock restarts
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs + idleTimeoutMs)
      recs.iterator.zipWithIndex.map { case (r, i) =>
        SegRecord(conv, cur.nextIdx + i, r)
      }
    }

    override def handleExpiredTimer(conv: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SegRecord] = {
      val cur = current
      if (cur.buf.isEmpty) Iterator.empty
      else {
        // A2 flush: emit the open buffer, advance the cursor — a line
        // arriving later starts record nextIdx+1 (the at-least-once split)
        st.update(SegState(Nil, cur.nextIdx + 1, cur.lastTurn))
        Iterator.single(SegRecord(conv, cur.nextIdx, cur.buf.mkString("\n")))
      }
    }
  }
}
