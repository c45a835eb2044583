package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketch statistics — the 100 TB pattern for cardinality and
  * quantiles: build a small partial sketch per group/partition/day,
  * store it, merge partials later without touching raw data again.
  *
  * All built on Spark's native codegen'd sketch aggregates (HLL++ for
  * approx_count_distinct, Apache DataSketches HLL for the mergeable
  * binary form, KLL-style percentile_approx) — no UDAFs, map-side
  * partial combine everywhere.
  */
object Sketches {

  /** Per-group approximate distinct count (HLL++, max `rsd` relative
    * standard deviation). */
  def approxDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as(s"approx_distinct_$valueCol"))

  /** Per-group approximate quantiles (`percentile_approx`, tunable
    * accuracy). */
  def approxQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
      probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val pArr = array(probs.map(lit): _*)
    df.groupBy(keys.map(col): _*)
      .agg(percentile_approx(col(valueCol), pArr, lit(accuracy))
        .as(s"quantiles_$valueCol"))
  }

  /** Stage 1 of the mergeable pipeline: one binary HLL sketch per group
    * (e.g. per day) — small enough to store alongside the data. */
  def hllPartials(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("hll"))

  /** Stage 2: merge partial sketches across groups (e.g. days → month)
    * and estimate — raw data is never re-read. */
  def hllMerge(partials: DataFrame, keys: Seq[String]): DataFrame = {
    val grouped =
      if (keys.isEmpty) partials.groupBy()
      else partials.groupBy(keys.map(col): _*)
    grouped.agg(hll_sketch_estimate(hll_sketch_agg_union()).as("distinct_estimate"))
  }

  private def hll_sketch_agg_union(): Column = hll_union_agg(col("hll"))
}
