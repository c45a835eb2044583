package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of join: for every left row, the latest right row with
  * the same key and event time ≤ the left row's (ties at equal time
  * match — ASOF `>=` semantics).
  *
  * Plan shape — union + one partitioned window, NOT a per-row range
  * probe: tag both sides, union them, and take
  * `last(<right value>, ignoreNulls) OVER (PARTITION BY key ORDER BY
  * (ts, side) ROWS UNBOUNDED PRECEDING..CURRENT)`; right rows sort
  * before left rows at equal ts so equality matches. One shuffle on the
  * key, per-key sort, linear scan — this is the shape that holds at
  * 100 TB (a range-condition join would be a per-row scan or an
  * interval explosion; the window is O(n log n) per key and
  * partition-parallel).
  */
object AsOfJoin {

  /** @param left        the probe side (all its columns are kept)
    * @param right       the reference side — MUST be unique per
    *                    (keys, tsCol); pre-aggregate if not
    * @param keys        equi-join key columns (present on both sides)
    * @param tsCol       event-time column name (both sides)
    * @param valueCols   right-side columns to carry (emitted as
    *                    `asof_<name>`, null when no match yet) */
  def lastBefore(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // right rows get _side=0 so they sort before left (_side=1) at equal ts
    val taggedLeft = valueCols.foldLeft(left.withColumn("_side", lit(1))) {
      (df, c) => df.withColumn(s"_r_$c", lit(null).cast(right.schema(c).dataType))
    }
    // NULL join keys never match under equi/ASOF semantics, but
    // Window.partitionBy groups NULLs into one partition — so null-key
    // reference rows must be dropped (null-key probe rows then see no
    // reference rows and correctly get null).
    val matchableRight = right.filter(keys.map(col(_).isNotNull).reduce(_ && _))
    val taggedRight = leftCols.filterNot(c => keys.contains(c) || c == tsCol)
      .foldLeft {
        valueCols.foldLeft(matchableRight.withColumn("_side", lit(0))) {
          (df, c) => df.withColumn(s"_r_$c", col(c))
        }.select((keys :+ tsCol).map(col) ++ Seq(col("_side")) ++ valueCols.map(c => col(s"_r_$c")): _*)
      } { (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)) }

    val unioned = taggedLeft.unionByName(taggedRight)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c")): _*)
  }
}
