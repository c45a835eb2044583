package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only cost breakdown for q30 (LSH generate → Jaccard verify). */
object ProfileQ30 {
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
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    for (_ <- 0 until 2) {
      time("signature only") {
        Dedup.minhashSignature(docs, "doc_id", "text", 16).count()
      }
      time("candidates (enum+1stcol)") {
        Dedup.minhashCandidates(docs, "doc_id", "text", 16, 4).count()
      }
      time("full q30") {
        Dedup.lshVerifiedPairs(docs, "doc_id", "text", 16, 4, 0.5).count()
      }
    }
    spark.stop()
  }
}
