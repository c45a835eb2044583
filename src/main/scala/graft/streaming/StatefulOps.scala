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

/** The per-key state of [[StatefulOps.timeoutSessions]]: every OPEN
  * sub-session (out-of-order arrivals within the watermark delay can
  * hold several gap-separated sessions open for one key at once).
  *
  * STATE-SCHEMA BREAK: the per-key state type was `SessionState`
  * (one open session) before it became `SessionList`. A streaming
  * query restarted from a checkpoint written by the old encoder will
  * fail or misbehave on state deserialization — there is no migration
  * path. Long-lived checkpoints that predate the change must be
  * discarded (start the query at a fresh checkpoint location). */
private case class SessionList(sessions: Seq[SessionState])

/** Per-group KMV sketch estimate emitted each micro-batch by
  * [[StatefulOps.kmvDistinctStream]] (Update mode: latest row per
  * group wins; (kUsed, −kthMin) is monotone). */
case class KmvUpdate(g: String, kUsed: Long, kthMin: Long, estDistinct: Double)

/** The bounded per-group state of [[StatefulOps.kmvDistinctStream]]:
  * the ≤k smallest distinct hashes seen — k longs, stream-length
  * independent. */
private case class KmvState(mins: Seq[Long])

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
    // null guards: a null value NPEs the non-nullable StateEvent
    // encoding, and a null ts slips past the watermark late-filter
    // (null comparisons aren't "late") only to NPE at ts.getTime
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(keyCol).as("key"), col(tsCol).as("ts"), col(valCol).as("value"))
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
    * `flatMapGroupsWithState`, Append output mode. Events ≤ `gapSec`
    * apart merge into one session (the same split rule as the batch
    * `Sessionize.assign`: a strictly-larger gap starts a new session,
    * INCLUDING gaps between events of one micro-batch); a session
    * closes (and emits exactly once) when the watermark passes its
    * end + gap. This is the hand-rolled equivalent of
    * `session_window` ([[StreamAgg.sessions]]), needed when the closed
    * session must carry custom state (here: exact event count; in
    * general: anything an aggregate can't hold).
    *
    * State per key is the list of OPEN sub-sessions — out-of-order
    * arrivals within the watermark delay can hold several
    * gap-separated sessions open at once, and a late event may BRIDGE
    * two of them (the interval merge below handles both). Sessions
    * closed within ONE `flatMapGroupsWithState` invocation are emitted
    * in session-start order; across micro-batches no order is promised
    * (a data-branch close and a later timeout close can reach an
    * Append sink out of start order for the same key — Append-mode
    * consumers must not rely on row order).
    *
    * Gap-boundary semantics vs the built-in `session_window`
    * ([[StreamAgg.sessions]]): this operator (and batch
    * `Sessionize.assign`) MERGES events exactly `gapSec` apart;
    * Spark's `session_window` merges only strictly-closer-than-gap.
    * See `docs/ARCHITECTURE.md` ("Sessionization: which operator") for
    * the choice table. */
  def timeoutSessions(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, delay: String, gapSec: Long): Dataset[SessionOut] = {
    require(gapSec > 0, "gapSec must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val gapMs = gapSec * 1000L
    def out(key: String, closed: Seq[SessionState]): Iterator[SessionOut] =
      closed.sortBy(_.startMs).iterator
        .map(s => SessionOut(key, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n))
    events(df, keyCol, tsCol, valCol)
      .withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[StateEvent], state: GroupState[SessionList]) =>
          if (state.hasTimedOut) {
            // no new data; the watermark passed at least one end + gap.
            // STRICT <: if an engine ever delivered a ts == watermark
            // event (today's late filter drops it — spec-pinned), at
            // exactly end + gap it must MERGE under the <=-gap rule,
            // so a session is never closed at equality. Timeouts fire
            // only when the watermark strictly passes the armed
            // end + gap, so the strict form still always emits here.
            val wm = state.getCurrentWatermarkMs()
            val (closed, open) = state.get.sessions.partition(_.endMs + gapMs < wm)
            if (open.isEmpty) state.remove()
            else {
              state.update(SessionList(open))
              state.setTimeoutTimestamp(open.map(_.endMs).min + gapMs)
            }
            out(key, closed)
          } else {
            // interval-merge new events into the open sub-sessions:
            // sorted by start, fold adjacent-within-gap runs together
            val evs = it.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1L))
            val all = (state.getOption.map(_.sessions).getOrElse(Nil) ++ evs)
              .sortBy(s => (s.startMs, s.endMs))
            val merged = all.foldLeft(List.empty[SessionState]) { (acc, s) =>
              acc match {
                case h :: t if s.startMs - h.endMs <= gapMs =>
                  SessionState(h.startMs, math.max(h.endMs, s.endMs), h.n + s.n) :: t
                case _ => s :: acc
              }
            }.reverse
            // sub-sessions strictly beyond the watermark close NOW: any
            // surviving input has ts >= watermark > their end + gap, so
            // nothing can merge with them again (late rows beyond the
            // delay were dropped by the watermark filter). STRICT <,
            // same defensive reason as the timeout branch: never close
            // a session at exactly end + gap == watermark.
            val wm = state.getCurrentWatermarkMs()
            val (closed, open) = merged.partition(_.endMs + gapMs < wm)
            // open is non-empty here: the batch's own events all have
            // ts >= wm, so their sub-sessions end + gap > wm
            state.update(SessionList(open))
            state.setTimeoutTimestamp(open.map(_.endMs).min + gapMs)
            out(key, closed)
          }
      }
  }

  /** Streaming KMV distinct-cardinality estimate — the ingest-time face
    * of [[graft.operators.Sketches.kmvDistinct]]. Per-group state is
    * the ≤k smallest distinct hashes of the shingle universe: k longs,
    * BOUNDED regardless of stream length (contrast the unbounded state
    * an exact streaming countDistinct would need). Each micro-batch
    * folds its hashes in (KMV insert ≡ union merge, so fold order
    * doesn't matter) and emits the group's refreshed estimate — Update
    * output mode; the latest row per group is the stream-so-far
    * estimate, and it equals the BATCH sketch over the same prefix
    * (StreamingSpec pins stream ≡ batch). (kUsed, −kthMin) is
    * monotone over a group's emissions: the min-set only improves. */
  def kmvDistinctStream(df: DataFrame, groupCol: String, textCol: String,
      shingleN: Int, k: Int): Dataset[KmvUpdate] = {
    // same guard as the batch twin (Sketches.kmvMinRows): k=1 makes the
    // estimator identically 0.0 and k<=0 crashes on the empty min-set
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.explode
    df.filter(col(textCol).isNotNull)
      .select(col(groupCol).cast("string").as("_g"),
        explode(graft.operators.Dedup.distinctShingles(col(textCol), shingleN)).as("_u"))
      .select(col("_g"),
        graft.functions.PortableHash.md5Hash32(col("_u")).as("_h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[(String, Long)], state: GroupState[KmvState]) =>
          val prev = state.getOption.map(_.mins).getOrElse(Seq.empty)
          val merged = (prev.toSet ++ it.map(_._2)).toSeq.sorted.take(k)
          state.update(KmvState(merged))
          val kUsed = merged.size.toLong
          val est =
            if (kUsed < k) kUsed.toDouble
            else ((k - 1).toLong * graft.operators.Sketches.KmvHashSpace).toDouble /
              merged.last.toDouble
          KmvUpdate(g, kUsed, merged.last, est)
      }
  }
}
