package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A keyed event for the stateful operators (typed `Dataset[T]` — the
  * state API is the one place the engine leaves `DataFrame`, because
  * arbitrary state needs case-class `Encoder`s). */
case class StateEvent(key: String, ts: Timestamp, value: Double)

/** Running per-key totals maintained by [[StatefulOps.runningTotals]]. */
case class RunningTotal(key: String, n: Long, total: Double)

/** A finalized inactivity session emitted by
  * [[StatefulOps.timeoutSessions]]. */
case class SessionOut(key: String, start: Timestamp, end: Timestamp, n: Long)

private case class SessionState(startMs: Long, endMs: Long, n: Long)

/** Custom streaming state beyond built-in windows/joins:
  * `mapGroupsWithState` / `flatMapGroupsWithState` over
  * `KeyValueGroupedDataset` — arbitrary per-key state with explicit
  * lifecycle (update, event-time timeout, removal). State lives in the
  * executor state stores, checkpointed with the query; the driver never
  * holds it. These cover the "custom state" tier the engine needs where
  * `session_window`/`window` aggregates can't express the semantics.
  */
object StatefulOps {

  private def events(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String): Dataset[StateEvent] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).as("key"), col(tsCol).as("ts"), col(valCol).as("value"))
      .as[StateEvent]
  }

  /** Per-key running (count, sum) across the whole stream —
    * `mapGroupsWithState`, no timeout, Update output mode. Each
    * micro-batch folds its new events into the stored total and emits
    * the refreshed row for exactly the keys that changed. */
  def runningTotals(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String): Dataset[RunningTotal] = {
    val spark = df.sparkSession
    import spark.implicits._
    events(df, keyCol, tsCol, valCol)
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[StateEvent], state: GroupState[RunningTotal]) =>
          val prev = state.getOption.getOrElse(RunningTotal(key, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          it.foreach { e => n += 1; total += e.value }
          val updated = RunningTotal(key, n, total)
          state.update(updated)
          updated
      }
  }

  /** Inactivity sessions with EXPLICIT event-time timeout —
    * `flatMapGroupsWithState`, Append output mode. Events `gapSec`
    * apart merge into one session; a session closes (and emits exactly
    * once) when the watermark passes its end + gap. This is the
    * hand-rolled equivalent of `session_window`, needed when the closed
    * session must carry custom state (here: exact event count; in
    * general: anything an aggregate can't hold). */
  def timeoutSessions(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, delay: String, gapSec: Long): Dataset[SessionOut] = {
    require(gapSec > 0, "gapSec must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val gapMs = gapSec * 1000L
    events(df, keyCol, tsCol, valCol)
      .withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[StateEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: the session is final
            val s = state.get
            state.remove()
            Iterator(SessionOut(key, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n))
          } else {
            val batch = it.toSeq
            val prev = state.getOption
            val startMs = (prev.map(_.startMs).toSeq ++ batch.map(_.ts.getTime)).min
            val endMs = (prev.map(_.endMs).toSeq ++ batch.map(_.ts.getTime)).max
            val s = SessionState(startMs, endMs, prev.map(_.n).getOrElse(0L) + batch.size)
            state.update(s)
            state.setTimeoutTimestamp(endMs + gapMs)
            Iterator.empty
          }
      }
  }
}
