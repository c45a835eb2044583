package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same key belong
  * to one session until the inter-event gap exceeds `gapSeconds`; the
  * session id is the running count of gap breaks (0-based per key).
  *
  * Two stacked windows over ONE (key, ts) sort: lag to mark breaks,
  * running sum to number sessions — a single shuffle on the key, no
  * self-join, partition-parallel (the standard islands-and-gaps shape).
  * Event-time ties are ordered by `tieCol` so both the engine and any
  * SQL oracle see the same total order.
  */
object Sessionize {

  def assign(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      gapSeconds: Long): DataFrame = {
    val order = Seq(col(tsCol).asc, col(tieCol).asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val prevUs = lag(unix_micros(col(tsCol)), 1).over(w)
    val brk = when(
      prevUs.isNull || unix_micros(col(tsCol)) - prevUs > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("_brk", brk)
      .withColumn("session_id",
        sum(col("_brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("_brk")
  }
}
