package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — capabilities T3/T4/J6
  * (SURVEY.md §2.4/§2.8).
  *
  * Reference (`pyspark/stream_combined.py:171-198`): both sides get a
  * 1-minute watermark on event-time columns that are COPIES made late in
  * the plan (`timestamp_weather` duplicated from `timestamp` at :171,
  * `timestamp_stock` from `datetime` at :179), and the full-outer join
  * condition is date equality AND a ±30 s interval between the two event
  * times. Spark plans this as StreamingSymmetricHashJoinExec with
  * watermark-bounded state eviction — state size is bounded by
  * (watermark + interval) × input rate per key, so the shape holds at
  * scale; the date-equality conjunct keys the state-store partitioning.
  */
object StreamJoin {

  /** Prepare one side: duplicate the event-time column (reference
    * semantics — watermark on the copy), derive the date key, watermark. */
  def side(df: DataFrame, tsCol: String, suffix: String, delay: String = "1 minutes"): DataFrame =
    df.withColumn(s"timestamp_$suffix", col(tsCol))
      .withColumn(s"date_$suffix", to_date(col(s"timestamp_$suffix")))
      .withWatermark(s"timestamp_$suffix", delay)

  /** Full-outer interval join: same date, |tsL − tsR| ≤ `toleranceSec`. */
  def intervalJoin(left: DataFrame, leftSuffix: String,
      right: DataFrame, rightSuffix: String,
      toleranceSec: Int = 30, joinType: String = "fullOuter"): DataFrame = {
    val cond =
      s"""date_$leftSuffix = date_$rightSuffix AND
         |timestamp_$leftSuffix >= timestamp_$rightSuffix - interval $toleranceSec seconds AND
         |timestamp_$leftSuffix <= timestamp_$rightSuffix + interval $toleranceSec seconds""".stripMargin
    left.join(right, expr(cond), joinType)
  }

  /** Stream-static dimension enrichment: equi-join a stream against a
    * (small) batch dimension frame, broadcast so every micro-batch is a
    * stateless map-side hash join — no state store, no watermark, no
    * shuffle of the stream. The 100 TB/day shape for attaching slowly-
    * changing dimensions; `leftOuter` keeps stream rows with no dim
    * match (inner drops them). The static side is re-resolvable per
    * batch, so replacing the dim source between restarts upgrades the
    * enrichment without touching stream state. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, keys: Seq[String],
      joinType: String = "left_outer"): DataFrame =
    stream.join(broadcast(dim), keys, joinType)
}
