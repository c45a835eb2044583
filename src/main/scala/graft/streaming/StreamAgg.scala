package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked time-window aggregation — the tumbling/sliding
  * counterpart to the reference's interval join (the reference buffers
  * late data only via watermark + join state; windowed aggregates are
  * the natural Spark-first form of its hourly batch rollups applied to
  * the stream). State per (window, keys) is evicted once the watermark
  * passes the window end — bounded memory at any corpus rate.
  */
object StreamAgg {

  /** Tumbling windows: non-overlapping `duration` buckets. Append-mode
    * emission happens when the watermark (lagging `delay` behind max
    * event time) passes each window's end. */
  def tumbling(df: DataFrame, tsCol: String, delay: String, duration: String,
      keyCols: Seq[String], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), duration) +: keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding windows: `duration`-long buckets starting every `slide`
    * (each event lands in duration/slide windows). */
  def sliding(df: DataFrame, tsCol: String, delay: String, duration: String,
      slide: String, keyCols: Seq[String], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), duration, slide) +: keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Gap sessionization as a WINDOW AGGREGATE — the idiomatic
    * Structured Streaming form of the batch `Sessionize` (one output
    * row per closed session instead of a session id per event): the
    * built-in `session_window` merges events less than `gap` apart,
    * state merges/evicts in the state store, and Append mode emits each
    * session exactly once when the watermark passes its end. The same
    * call works on a BATCH frame (session_window is a plain grouping
    * there), which is what the stream ≡ batch spec pins.
    *
    * `session_end` is the built-in's definition — last event + gap
    * (the session's expiry instant), not the last event time; and the
    * merge rule is strictly-less-than-gap, so an event at EXACTLY
    * gap distance starts a new session (the batch `Sessionize.assign`
    * keeps it — use [[StatefulOps.timeoutSessions]] when that boundary
    * must match batch exactly). */
  def sessions(df: DataFrame, tsCol: String, delay: String, gap: String,
      keyCols: Seq[String], aggs: Seq[Column]): DataFrame = {
    val watermarked =
      if (df.isStreaming) df.withWatermark(tsCol, delay) else df
    watermarked
      .groupBy(session_window(col(tsCol), gap) +: keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")
  }
}
