package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location: pre-shuffle data once at write time so
  * repeated joins/aggregations on the bucket key run with NO exchange.
  *
  * At 100 TB the dominant cost of a fact⋈fact join is shuffling both
  * sides; bucketing both tables by the join key into the same bucket
  * count lets Spark plan a SortMergeJoin over co-located buckets —
  * scan → sort → join, zero Exchange nodes. The write pays one shuffle,
  * every downstream join rides free.
  */
object Bucketed {

  def write(df: DataFrame, table: String, bucketKeys: Seq[String], nBuckets: Int): Unit =
    df.write
      .bucketBy(nBuckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(bucketKeys.head, bucketKeys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
