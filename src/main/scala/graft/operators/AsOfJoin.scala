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
    val rStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType)))
    // right rows get _side=0 so they sort before left (_side=1) at equal
    // ts. The carried payload is ONE struct of all valueCols: last(...,
    // ignoreNulls) then skips only the left-row placeholders — a
    // GENUINELY null value inside the latest matching row stays null
    // (per-column carries fell back to a STALE older row's value, and
    // could even mix columns from different reference rows).
    val taggedLeft = left.withColumn("_side", lit(1))
      .withColumn("_r", lit(null).cast(rStructType))
    // NULL join keys never match under equi/ASOF semantics, but
    // Window.partitionBy groups NULLs into one partition — so null-key
    // reference rows must be dropped (null-key probe rows then see no
    // reference rows and correctly get null). A null-TS reference row
    // is equally unmatchable (no left ts is >= null) yet sorts FIRST
    // ascending — unfiltered it would match every probe row of its key.
    val matchableRight = right.filter(
      (keys :+ tsCol).map(col(_).isNotNull).reduce(_ && _))
    val taggedRight = leftCols.filterNot(c => keys.contains(c) || c == tsCol)
      .foldLeft {
        matchableRight.withColumn("_side", lit(0))
          .withColumn("_r", struct(valueCols.map(col): _*))
          .select((keys :+ tsCol).map(col) ++ Seq(col("_side"), col("_r")): _*)
      } { (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)) }

    val unioned = taggedLeft.unionByName(taggedRight)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col("_asof").getField(c).as(s"asof_$c")): _*)
  }
}
