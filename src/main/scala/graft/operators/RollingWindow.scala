package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import graft.functions.PortableRound

/** Forward-looking rolling range windows — capabilities W1/W2
  * (SURVEY.md §2.6).
  *
  * Reference: `Window().orderBy(unix_ts).rangeBetween(0, 3600)` → 1-hour
  * forward sum of transactions as the ML label (`pyspark/ML_stock.py:
  * 161-171`) and the same frame's avg (`ML_tomtom.py:175-181`). Both are
  * GLOBAL windows (no partitionBy) — the reference accepts Spark's
  * "No Partition Defined" single-task execution.
  *
  * We keep the global variant for oracle parity (identical semantics) and
  * provide a partitioned variant for scale: partition by a coarse time
  * bucket and overlap-extend each partition's frame so frames never cross
  * a partition boundary unseen. At 100 TB the global window is the
  * documented hot spot (SURVEY.md §7.4); `partitioned` is the shape that
  * survives — shuffle by day-bucket, per-bucket sort, no global sort on a
  * single task.
  */
object RollingWindow {

  /** Windowed aggregate with engine-portable float semantics: sums run
    * in DECIMAL(18,6) (exact, association-order-free — DuckDB evaluates
    * window frames with segment trees, Spark with a sorted sweep, so
    * double sums would differ in ulps), averages divide the exact sum by
    * the frame count with one IEEE division, and rounding is
    * [[PortableRound]]. */
  private def windowed(fn: String, measure: String, w: WindowSpec): Column = {
    // try_cast: ANSI-mode cast(NaN AS DECIMAL) would abort the job
    val dec = col(measure).try_cast("decimal(18,6)")
    fn match {
      case "sum" => PortableRound.round2(sum(dec).over(w).cast("double"))
      case "avg" => PortableRound.round2(
        sum(dec).over(w).cast("double") / count(col(measure)).over(w))
      case "count" => count(col(measure)).over(w)
      case "min" => PortableRound.round2(min(col(measure)).over(w))
      case "max" => PortableRound.round2(max(col(measure)).over(w))
      case other => throw new IllegalArgumentException(s"unsupported window agg: $other")
    }
  }

  /** Exact reference semantics: global ORDER BY unix seconds, frame
    * [current, current + seconds]. */
  def forwardGlobal(df: DataFrame, unixCol: String, seconds: Long, aggs: (String, String)*): DataFrame = {
    val w = Window.orderBy(col(unixCol)).rangeBetween(0L, seconds)
    aggs.foldLeft(df) { case (acc, (fn, measure)) =>
      acc.withColumn(s"${fn}_${measure}_${seconds}s", windowed(fn, measure, w))
    }
  }

  /** Scale path: bucket rows by `bucketSeconds`, duplicate each row into
    * the PRECEDING bucket as frame-feed (forward frames only read ahead
    * ≤ `seconds`, and `bucketSeconds >= seconds` guarantees one-bucket
    * lookahead suffices), window inside each bucket, keep original rows.
    * Distributed: shuffle on bucket, per-bucket sort, no global task. */
  def forwardPartitioned(
      df: DataFrame,
      unixCol: String,
      seconds: Long,
      fn: String,
      measure: String,
      bucketSeconds: Long = 86400L): DataFrame = {
    require(bucketSeconds >= seconds, "bucket must cover the frame lookahead")
    val bucket = (col(unixCol) / bucketSeconds).cast("long")
    val own = df.withColumn("_bucket", bucket).withColumn("_feed", lit(false))
    val feed = df.withColumn("_bucket", bucket - 1).withColumn("_feed", lit(true))
    val w = Window.partitionBy(col("_bucket")).orderBy(col(unixCol)).rangeBetween(0L, seconds)
    own.unionByName(feed)
      .withColumn(s"${fn}_${measure}_${seconds}s", windowed(fn, measure, w))
      .filter(!col("_feed"))
      .drop("_bucket", "_feed")
  }
}
