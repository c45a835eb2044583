package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global-ordering primitives.
  *
  * The naive `row_number() OVER (ORDER BY …)` is an empty-partition
  * window: Spark plans it as Exchange SinglePartition — the whole
  * corpus serializes through ONE task, the canonical shape that dies at
  * 100 TB. [[globalRank]] produces the identical contiguous numbering
  * with no data-sized single-partition stage:
  *
  *   1. range-partition the rows on the sort key (every key in
  *      partition i precedes every key in partition i+1);
  *   2. rank LOCALLY inside each partition (window partitioned by the
  *      physical partition id — parallel, no extra exchange: the rows
  *      are already co-located by construction);
  *   3. prefix-sum the per-partition row COUNTS — one long per
  *      partition, ~KB for thousands of partitions — and broadcast the
  *      offsets back;
  *   4. global rank = partition offset + local row number.
  *
  * Data rows move once: the rank branch and the counts branch both
  * consume the SAME range exchange, which Spark's ReuseExchange rule
  * dedups into one physical shuffle (RankingSpec asserts this — the
  * counts side shows as ReusedExchange). The only single-partition
  * stage operates on the partition-count relation, which is
  * metadata-sized at any corpus scale. The same two-pass offset idiom
  * backs `TextAnalysis.packShardsScalable` and `RollingWindow`'s
  * partitioned variant.
  */
object Ranking {

  /** Contiguous global row numbers (1-based) under the total order
    * `sortCols`. The order MUST be total — include a unique tiebreaker
    * (e.g. the primary key) as the last sort column, otherwise ranks of
    * tied rows depend on physical placement. */
  def globalRank(df: DataFrame, sortCols: Seq[Column], numParts: Int,
      rankCol: String = "rnk"): DataFrame = {
    require(sortCols.nonEmpty, "at least one sort column")
    require(numParts > 0, "numParts must be positive")
    val parted = df.repartitionByRange(numParts, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
    // partitioned by _pid → one window instance per (already range-sorted)
    // partition; no additional exchange is planned for it.
    val local = Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
    val ranked = parted.withColumn("_lrn", row_number().over(local).cast("long"))
    val counts = ranked.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
    // Single-partition window over numParts rows — metadata-sized.
    val offW = Window.orderBy(col("_pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .select(col("_pid"), coalesce(sum(col("_n")).over(offW), lit(0L)).as("_off"))
    ranked.join(broadcast(offsets), Seq("_pid"))
      .withColumn(rankCol, col("_off") + col("_lrn"))
      .drop("_pid", "_lrn", "_off")
  }
}
