package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round-11 verdict item 8): measure the q126 adaptive
  * pagerank's driver-solve vs distributed-superstep crossover, so the
  * `driverSolveMaxEdges` ceiling is a MEASURED number, not a guess.
  *
  * For each closure-edge size the same synthetic pair list (persisted,
  * hash-spread endpoints, avg degree ~16) runs through BOTH paths of
  * `Graph.pageRankUndirectedMicro` — ceiling above the graph forces the
  * primitive-array driver solve, ceiling 0 forces the superstep loop —
  * min-of-2 each, 3 iterations (q126's shape). Results → SURVEY §16.
  *
  * Run: SPARK_DRIVER_MEM=16g sbt "Test/runMain graft.ProfilePageRankCeiling"
  */
object ProfilePageRankCeiling {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("profile-pagerank-ceiling")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val iters = 3
    for (closureEdges <- Seq(2000000L, 8000000L, 32000000L)) {
      val nPairs = closureEdges / 2
      val nNodes = math.max(1000L, nPairs / 8)
      // exactly nPairs distinct pairs, avg degree ~16: per node a, the
      // 8 neighbors a+1+k (k = id/nNodes in 0..7) — no self loops, no
      // modular cycling collapsing the dedup count
      val pairs = spark.range(nPairs).select(
        (col("id") % nNodes).as("a"),
        ((col("id") % nNodes + lit(1) +
          floor(col("id") / nNodes).cast("long")) % nNodes).as("b"))
        .filter(col("a") =!= col("b"))
      pairs.persist()
      val nDedup = pairs.distinct().count()
      def time(ceiling: Long): Double = {
        val t0 = System.nanoTime()
        graft.operators.Graph
          .pageRankUndirectedMicro(pairs, "a", "b", iters, ceiling).count()
        (System.nanoTime() - t0) / 1e9
      }
      val drv = (1 to 2).map(_ => time(Long.MaxValue / 4)).min
      val sup = (1 to 2).map(_ => time(0L)).min
      println(f"closure~$closureEdges%d dedup_pairs=$nDedup%d " +
        f"driver=$drv%.2f s superstep=$sup%.2f s ratio=${sup / drv}%.2f")
      pairs.unpersist()
    }
    spark.stop()
  }
}
