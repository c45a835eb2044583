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
}
