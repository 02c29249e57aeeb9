package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
    * "no flush until the record closes" semantics. There is deliberately
    * no wall-clock flush by default (A2's timeout flush is an at-least-once
    * window; see SURVEY §2 A2).
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
}
