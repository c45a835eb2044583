package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable event-time range self-join: all pairs of same-key rows
  * within ±`toleranceSec` — the batch analog of the streaming interval
  * join (SURVEY.md §2.4 J6), built so it never degenerates into a
  * per-key cross product or a nested-loop range probe.
  *
  * Bucketing trick: rows land in `floor(ts / tol)` buckets; a pair
  * within ±tol is either same-bucket or adjacent-bucket, so joining A
  * against B replicated into (bucket−1, bucket, bucket+1) with an
  * equi-key on (key, bucket) finds every pair EXACTLY ONCE (the bucket
  * delta −1/0/+1 is uniquely determined per pair — no dedup pass).
  * Shuffle is on (key, bucket): high cardinality, no hot single key,
  * 3× replication of one side as the only overhead.
  */
object RangeJoin {

  /** Pairs (id_a < id_b) of same-`keyCol` rows with |ts_a − ts_b| ≤
    * `toleranceSec`, with both timestamps carried.
    *
    * toleranceSec = 0 degenerates to exact-timestamp pairs, which the
    * bucket scheme cannot express (a zero-width bucket divides by zero
    * and would silently return no rows), so it is planned as a plain
    * equi-join on (key, timestamp). Negative tolerance is rejected. */
  def selfWithinTolerance(df: DataFrame, keyCol: String, idCol: String,
      tsCol: String, toleranceSec: Long): DataFrame = {
    require(toleranceSec >= 0, s"toleranceSec must be >= 0, got $toleranceSec")
    val base = df.select(
      col(keyCol).as("k"),
      col(idCol).as("id"),
      unix_micros(col(tsCol)).as("us"))
    if (toleranceSec == 0) {
      val a = base.select(col("k"), col("id").as("id_a"), col("us").as("us_a"))
      val b = base.select(col("k"), col("id").as("id_b"), col("us").as("us_a"))
      return a.join(b, Seq("k", "us_a"))
        .filter(col("id_a") < col("id_b"))
        .select(col("k"), col("id_a"), col("id_b"),
          timestamp_micros(col("us_a")).as("ts_a"),
          timestamp_micros(col("us_a")).as("ts_b"))
    }
    val usec = toleranceSec * 1000000L
    val a = base.select(col("k"), col("id").as("id_a"), col("us").as("us_a"))
      .withColumn("bucket", floor(col("us_a") / usec))
    val b = base.select(col("k"), col("id").as("id_b"), col("us").as("us_b"))
      .withColumn("bucket", explode(array(
        floor(col("us_b") / usec) - 1,
        floor(col("us_b") / usec),
        floor(col("us_b") / usec) + 1)))
    a.join(b, Seq("k", "bucket"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("us_a") - col("us_b")) <= usec)
      .select(col("k"), col("id_a"), col("id_b"),
        timestamp_micros(col("us_a")).as("ts_a"),
        timestamp_micros(col("us_b")).as("ts_b"))
  }
}
