package graft.streaming

import org.apache.spark.sql.DataFrame

/** Watermarked streaming deduplication — capability T5 (SURVEY.md §2.8).
  *
  * Present in the reference only as commented-out intent
  * (`pyspark/stream_openweather.py:76`, `stream_combined.py:71,173,181`)
  * but part of the declared capability surface: drop duplicate events by
  * key within the watermark horizon. State is evicted past the
  * watermark, so memory is bounded by (rate × delay) distinct keys.
  */
object StreamDedup {

  def dedup(df: DataFrame, eventTimeCol: String, delay: String, keys: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicates(keys :+ eventTimeCol)

  /** Spark 3.5+ variant that dedups by KEY ALONE within the watermark
    * horizon: same-key rows are dropped even when their event times
    * differ ([[dedup]] keys on (keys, eventTime), so it KEEPS same-key
    * rows at different times). Use this when redeliveries carry drifted
    * timestamps; use [[dedup]] when same-key-different-time rows are
    * distinct events. */
  def dedupWithinWatermark(df: DataFrame, eventTimeCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys)
}
