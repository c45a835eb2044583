package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Dev-only: alternating A/B of the fused native qualityScore vs the
  * three-pass composition, same JVM, noop sink (guide §1.4) — the
  * between-process Scratch readings swing ±50% with co-tenant load,
  * so the score fuse is judged on interleaved in-process passes. */
object ProfileQuality {
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
    val docs = graft.queries.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))

    def noop(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val fused = docs.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("q"))
    val composed = docs.select(col("doc_id"),
      TextAnalysis.qualityScoreComposed(col("text")).as("q"))
    // warmup both
    noop(fused); noop(composed)
    val (fs, cs) = (Array.fill(6)(0.0), Array.fill(6)(0.0))
    for (r <- 0 until 6) { fs(r) = noop(fused); cs(r) = noop(composed) }
    println(f"[profq] fused    min=${fs.min}%6.3f  runs=${fs.map(x => f"$x%5.3f").mkString(",")}")
    println(f"[profq] composed min=${cs.min}%6.3f  runs=${cs.map(x => f"$x%5.3f").mkString(",")}")
    spark.stop()
  }
}
