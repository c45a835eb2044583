package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Dev A/B harness: native Md5Hash32 vs the composed
  * conv(substring(md5,1,8),16,10) form, same JVM, interleaved passes —
  * isolates the expression cost from JIT/run-order effects. Not part of
  * the engine surface. */
object ProfileMd5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.1", "documents")
      .localCheckpoint()
    val toks = docs.select(explode(split(col("text"), " ")).as("t")).localCheckpoint()
    toks.count()
    def native(c: org.apache.spark.sql.Column) =
      ColumnBridge.column(graft.functions.Md5Hash32(
        ColumnBridge.expression(c.cast("string"))))
    def composed(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 8), 16, 10).cast("long")
    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    // flat projection path
    for (r <- 1 to 4) {
      val tn = time("native")(toks.select(sum(native(col("t")))).head.getLong(0))
      val tc = time("composed")(toks.select(sum(composed(col("t")))).head.getLong(0))
      println(f"[md5ab] flat r$r: native $tn%.3f s  composed $tc%.3f s")
    }
    // lambda (interpreted) path: hash every 3-gram inside transform
    val grams = docs.select(col("text"))
    def gramSum(h: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      grams.select(sum(aggregate(
        transform(graft.operators.Dedup.distinctShingles(col("text"), 3), g => h(g)),
        lit(0L), (acc, x) => acc + x))).head.getLong(0)
    for (r <- 1 to 4) {
      val tn = time("native")(gramSum(native))
      val tc = time("composed")(gramSum(composed))
      println(f"[md5ab] lambda r$r: native $tn%.3f s  composed $tc%.3f s")
    }
    spark.stop()
  }
}
