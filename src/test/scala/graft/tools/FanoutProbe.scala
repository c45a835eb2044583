package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: fan-out sensitivity probe. Runs selected queries on a
  * local[32] master while sweeping `spark.sql.shuffle.partitions`
  * (which `Plans.shufflePartitions` reads for the explicit-N
  * repartition fan-outs) — separating "how many cores" from "how many
  * partitions" so the volume-aware fan-out rule can be fit to
  * measurements instead of guessed. Usage:
  * `Test/runMain graft.FanoutProbe q117 q32 ...` (prefix match);
  * `SPARK_GRAFT_FANOUTS=32,16,8,4` picks the sweep values. */
object FanoutProbe {
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
    val wanted = if (args.nonEmpty) args.toSeq else Seq("q117")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => wanted.exists(w => n.startsWith(w)))
    val fanouts = sys.env.getOrElse("SPARK_GRAFT_FANOUTS", "32,16,8,4")
      .split(",").toSeq.map(_.trim.toInt)
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    // warm pass: build artifacts once so the sweep times steady state
    System.clearProperty("graft.bench.reuseArtifacts")
    names.foreach(n => SparkEntry.queries(n)(spark, dir).count())
    System.setProperty("graft.bench.reuseArtifacts", "true")
    try {
      for (name <- names) {
        for (n <- fanouts) {
          spark.conf.set("spark.sql.shuffle.partitions", n.toString)
          val times = (1 to repeat).map { _ =>
            val t0 = System.nanoTime()
            SparkEntry.queries(name)(spark, dir).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[fanout] $name%-40s N=$n%-3d min=${times.min}%6.3f  all=${times.map(t => f"$t%.2f").mkString(",")}")
        }
      }
    } finally System.clearProperty("graft.bench.reuseArtifacts")
    spark.stop()
  }
}
