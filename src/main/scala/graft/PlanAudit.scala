package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: dump the formatted physical plan of every declared query
  * to docs/PLANS.md, plus a summary line per query flagging common
  * scale smells (no-pushdown scans, cartesian products, single-partition
  * windows, missing broadcasts). Not part of the engine surface. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("# Physical plans (sf0.01, local[4]) — dev audit artifact\n\n")
    sb.append("Regenerate: `sbt \"runMain graft.PlanAudit\"`\n")

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // global windows never announce themselves in explain text — the
      // "No Partition Defined" warning is runtime-only — so inspect the
      // optimized logical plan for Window nodes with an empty
      // partitionSpec instead.
      val hasGlobalWindow = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }.nonEmpty
      val smells = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "global-window" -> hasGlobalWindow,
        "sort-merge-join" -> plan.contains("SortMergeJoin")
      ).collect { case (s, true) => s }
      sb.append(s"\n## $name${if (smells.nonEmpty) smells.mkString("  [", ", ", "]") else ""}\n\n")
      sb.append("```\n").append(plan.trim.take(6000)).append("\n```\n")
    }
    Files.createDirectories(Paths.get("docs"))
    Files.writeString(Paths.get("docs/PLANS.md"), sb.toString)
    println(s"[audit] wrote docs/PLANS.md (${SparkEntry.queries.size} plans)")
    spark.stop()
  }
}
