package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only: dump `explain("formatted")` for selected queries into
  * `plans/<tag-dir>/<query>_<tag>.txt` — the optimization rounds'
  * before/after plan evidence. Usage:
  * `Test/runMain graft.PlanDump r15 before q155 q156 ...`
  * (dir under plans/, tag suffix, then name prefixes). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <round-dir> <tag> <prefix>...")
    val (roundDir, tag, prefixes) = (args(0), args(1), args.drop(2).toSeq)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = Paths.get(s"plans/$roundDir")
    Files.createDirectories(out)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(out.resolve(s"${name}_$tag.txt"), plan)
        println(s"[plandump] $name -> plans/$roundDir/${name}_$tag.txt")
      }
    spark.stop()
  }
}
