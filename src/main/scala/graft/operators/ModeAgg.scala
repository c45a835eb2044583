package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped mode via the argmax-struct trick — capability A3
  * (SURVEY.md §2.5).
  *
  * Reference (`mode_result`, `pyspark/batch_openweather.py:12-19`;
  * two-key variants `batch_tomtom.py:12-30`): count per (keys, value),
  * then `max(struct(count, value))` and project `max.value`. Ties on
  * count resolve to the LEXICALLY GREATEST value — that tie-break is the
  * reference's observable semantic and is preserved here (struct max
  * compares fields left-to-right).
  *
  * Scale: two hash aggregates, both with map-side partial combine. The
  * shuffle key of the first agg is (keys, value) — high cardinality but
  * pre-combined; the second shuffles one row per (keys, value) group.
  * No single-partition hotspots, no collect.
  */
object ModeAgg {

  def mode(df: DataFrame, keys: Seq[String], valueCol: String, outName: String): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    val counted = df
      .groupBy((keyCols :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("cnt"))
    counted
      .groupBy(keyCols: _*)
      .agg(max(struct(col("cnt"), col(valueCol))).as("m"))
      .select((keyCols :+ col(s"m.$valueCol").as(outName)): _*)
  }
}
