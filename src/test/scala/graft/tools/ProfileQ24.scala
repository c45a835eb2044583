package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{Plans, PortableRound}
import graft.operators.Dedup

/** Dev-only cost breakdown for q24 (blocked Jaccard pairs). */
object ProfileQ24 {
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

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // warm page cache
    docs.count()

    val toks = docs.select(
      col("lang").as("block"),
      col("doc_id").as("id"),
      array_sort(Dedup.distinctTokens(col("text"))).as("toks"))
    val nPart = Plans.shufflePartitions(docs)
    val a = toks.repartition(nPart).select(col("block"), col("id").as("id_a"),
      col("toks").as("toks_a"), size(col("toks")).cast("long").as("n_a"))
    val b = toks.select(col("block"), col("id").as("id_b"),
      col("toks").as("toks_b"), size(col("toks")).cast("long").as("n_b"))
    val tScaled = math.round(0.5 * 20000) - 1
    val joined = a.as("A").join(broadcast(b.as("B")),
      col("A.block") === col("B.block") &&
        col("id_a") < col("id_b") &&
        least(col("n_a"), col("n_b")) * 20000L >= greatest(col("n_a"), col("n_b")) * tScaled)

    for (_ <- 0 until 2) {
      time("tokenize+sort only") {
        toks.agg(sum(size(col("toks")))).collect().head.getLong(0)
      }
      time("enumerate only") { joined.count() }
      time("enumerate+intersect") {
        joined.withColumn("n_int",
          graft.functions.ArrayOps.sortedIntersectSize(col("toks_a"), col("toks_b")).cast("long"))
          .filter(col("n_int") >= 0).count()
      }
      time("full q24 (no sort)") {
        Dedup.jaccardPairs(docs, "doc_id", "text", "lang", 0.5).count()
      }
      time("full q24 (with sort)") {
        Dedup.jaccardPairs(docs, "doc_id", "text", "lang", 0.5)
          .orderBy("block", "id_a", "id_b").count()
      }
    }
    spark.stop()
  }
}
