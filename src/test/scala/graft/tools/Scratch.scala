package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling entry point — not part of the engine surface.
  * Times individual SparkEntry queries exactly as Bench does
  * (`fn(spark, dir).count()`), so numbers are comparable to
  * BENCH_r{N}.json. Usage: `Test/runMain graft.Scratch q24 q30 ...`
  * (prefix match; no args = the heavy set). */
object Scratch {
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
    val wanted = if (args.nonEmpty) args.toSeq else Seq("q22", "q24", "q30", "q32")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => wanted.exists(w => n.startsWith(w)))
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt
    // SPARK_GRAFT_WARM=1: run 1 builds artifacts (full declared
    // semantics), runs 2..N time the probe steady state under
    // graft.bench.reuseArtifacts — Bench's warm-sweep discipline, so
    // Scratch numbers stay comparable to BENCH_FULL warm values.
    val warm = sys.env.get("SPARK_GRAFT_WARM").contains("1")
    for (name <- names; r <- 1 to repeat) {
      if (warm && r > 1) System.setProperty("graft.bench.reuseArtifacts", "true")
      else System.clearProperty("graft.bench.reuseArtifacts")
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[scratch] $name%-30s run$r ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
