package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness for the winnowing family (q140/q142): times
  * the fingerprint projection, the df cut, and the pair join
  * separately to localize cost. Not part of the engine surface. */
object ProfileQ140 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.1", "documents")
    docs.count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    }
    time("tokens only") {
      docs.filter(col("text").isNotNull)
        .select(explode(split(col("text"), " "))).count()
    }
    time("gram md5 hashes") {
      docs.filter(col("text").isNotNull)
        .select(explode(graft.operators.Dedup.distinctShingles(col("text"), 3)))
        .select(graft.functions.PortableHash.md5Hash32(col("col"))).count()
    }
    for (round <- 1 to 2)
      time(s"winnowFingerprints r$round") {
        graft.operators.Dedup.winnowFingerprints(docs, "doc_id", "text", 3, 4).count()
      }
    time("winnowedDupPairs full") {
      graft.operators.Dedup.winnowedDupPairs(docs, "doc_id", "text", 3, 4, 20, 3).count()
    }
    val fp = graft.operators.Dedup.winnowFingerprints(docs, "doc_id", "text", 3, 4)
    var fpc: org.apache.spark.sql.DataFrame = null
    time("fp localCheckpoint") { fpc = fp.localCheckpoint(); fpc.count() }
    time("rare from checkpoint") {
      fpc.groupBy(col("fp")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= 20).count()
    }
    time("pairs from checkpoint") {
      val rare = fpc.groupBy(col("fp")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= 20).select("fp")
      val keep = fpc.join(rare, Seq("fp"), "left_semi")
      val a = keep.select(col("fp"), col("doc_id").as("doc_a"))
      val b = keep.select(col("fp"), col("doc_id").as("doc_b"))
      a.join(b, Seq("fp")).filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 3).count()
    }
    spark.stop()
  }
}
