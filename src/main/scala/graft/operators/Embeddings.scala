package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{ExactAgg, PortableRound}

/** Vector-column aggregation beyond similarity search: per-group
  * centroids over an embedding column — cluster prototypes for IVF
  * training, semantic-group summaries, drift monitoring.
  *
  * Plan shape: posexplode to (group, pos, component) — a narrow per-row
  * expansion, dim× rows but tiny ones — then ONE partial-aggregated
  * hash aggregate keyed (group, pos). Parallelism is groups×dim, so the
  * shuffle never bottlenecks on group count alone; re-assembly sorts
  * the dim-sized struct list per group. Component means use the
  * engine's exact decimal summation ([[ExactAgg]]) + portable rounding,
  * so results are bitwise-reproducible across engines and partitionings.
  */
object Embeddings {

  /** Per-`labelCol` exact component-wise mean of `vecCol` (4dp) plus
    * member count. Vectors must share one dimensionality. Output:
    * (label, n, centroid: array&lt;double&gt;). */
  def centroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val comps = df.select(col(labelCol),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "c")))
    val perPos = comps.groupBy(col(labelCol), col("pos"))
      .agg(
        PortableRound.round4(ExactAgg.avgExact(col("c"))).as("m"),
        count(lit(1)).as("n_pos"))
    perPos.groupBy(col(labelCol))
      .agg(
        max(col("n_pos")).as("n"),
        transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
  }
}
