package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: q164's stage costs at sf0.1 — feature pass vs the
  * banding/verify join tail — plus the band-key population, to confirm
  * candidate counts stay pair-sized (no key collapse). The round-12
  * finding it records: the per-char decode subtree must be let-bound
  * (ArrayOps.bind) or it re-evaluates once per window (dim× cost,
  * 4.1 s -> 2.2 s at sf0.1); the residual ~1 s AFTER the 0.2 s warm
  * feature pass is multi-stage scheduling overhead at local[32], not
  * data volume (196 verified pairs from 778 raw candidates). */
object ProfileQ164 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.1", "documents")
    val withBin = graft.operators.Multimodal.attachPayload(docs, "text", "text")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-6s ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    for (_ <- 1 to 2) {
      time("feats") {
        withBin.filter(col("media").isNotNull)
          .select(col("doc_id"),
            graft.operators.Multimodal.stubFeaturesMicro(col("media"), 16).as("_f"))
          .agg(count(lit(1))).head.getLong(0)
      }
      time("full") {
        graft.operators.Multimodal
          .mediaNearDupPairs(withBin, "doc_id", "media", 16, 4, 2000L).count()
      }
    }
    spark.stop()
  }
}
