package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 q126 evidence (r15 verdict item 6): (a) the DECLARED
  * isolated-probe protocol — min-of-N cross-JVM-comparable timings of
  * the full q126 query at local[32]/32 partitions on one JVM, bracketed
  * by a box-speed control so a loaded window convicts itself; (b) a
  * committed plan dump of one SUPERSTEP of the distributed loop (the
  * >2M-edge scale path the bench's driver-solve never shows), so the
  * one-shuffle-per-superstep claim is checkable from the repo. */
object ProbeQ126R16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()

    // box-speed control: a pure-relational aggregate over lineitem —
    // no hash work, scales with host speed only
    def control(): Double = {
      val t0 = System.nanoTime()
      graft.queries.Tables.t(spark, dir, "lineitem")
        .groupBy("l_returnflag").agg(count(lit(1)), sum("l_extendedprice"))
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "6").toInt
    val q = SparkEntry.queries("q126_link_pagerank")
    val pre = control()
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); q(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val post = control()
    println(f"[q126probe] control pre=$pre%.3f post=$post%.3f  " +
      f"times=${times.map(t => f"$t%.2f").mkString(",")}  min=${times.min}%.3f")

    // superstep plan: force the distributed loop's frame shape at this
    // SF (pageRankFrame with 1 iteration — the per-iteration marginal
    // plan; the k-iteration plan is this shape stacked)
    val pairs = graft.queries.Tables.t(spark, dir, "lineitem")
      .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
    val (ranks, edges, deg) = graft.operators.Graph.pageRankFrame(pairs, "a", "b", 1)
    deg.count() // materialize the closure caches like the real path
    val plan = ranks.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    Files.createDirectories(Paths.get("plans/r16"))
    Files.writeString(Paths.get("plans/r16/q126_superstep_1iter.txt"), plan)
    val nEx = "Exchange".r.findAllIn(plan).length
    println(s"[q126probe] superstep plan written; Exchange mentions=$nEx")
    edges.unpersist(blocking = false); deg.unpersist(blocking = false)
    spark.stop()
  }
}
