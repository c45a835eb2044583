package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only: does the shingle lambda re-evaluate split() per element? */
object ProfileShingles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val n = 5
    // current: shingles over the raw text expression
    val cur = docs.select(explode(Dedup.distinctShingles(col("text"), n)).as("g"))
    // variant: tokens materialized as a column first
    val toksCol = docs.select(col("doc_id"), split(col("text"), " ").as("_toks"))
    val starts = when(size(col("_toks")) >= n, sequence(lit(1), size(col("_toks")) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    val mat = toksCol.select(explode(array_distinct(
      transform(starts, i => concat_ws(" ", slice(col("_toks"), i, lit(n)))))).as("g"))

    for (_ <- 0 until 2) {
      time("shingles over raw text") { cur.count() }
      time("shingles over materialized toks") { mat.count() }
    }
    spark.stop()
  }
}
