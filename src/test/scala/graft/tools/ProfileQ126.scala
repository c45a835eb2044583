package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev probe (round-15 verdict item 2): PHASE-LEVEL timing of q126's
  * superstep PageRank on the real scaled lineitem graph, comparing the
  * round-14 edge-build shape ("old": distinct → repartition, unsorted
  * cache) against the candidate re-shape ("new": repartition → distinct
  * → sortWithinPartitions) INSIDE ONE JVM — sequential whole-process
  * runs proved uninterpretable (the second run inherits the first's
  * page cache; the 96 g heap itself shifts the cache regime between
  * runs). Each shape runs `passes` times; supersteps are MATERIALIZED
  * (node-sized localCheckpoint between steps) so the marginal cost of
  * each step is visible. Prints one superstep plan per shape so the
  * edge-side Sort/Exchange difference is explicit.
  *
  * Run: SPARK_DRIVER_MEM=96g sbt "Test/runMain graft.ProfileQ126 target/testdata/sf10"
  */
object ProfileQ126 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/testdata/sf10"
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("profile-q126")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val li = graft.queries.Tables.t(spark, dir, "lineitem")
    val pairs = li.select((col("l_partkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst"))
    val p = t("p: distinct + checkpoint + count") {
      val x = pairs
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .distinct()
        .transform(graft.operators.Checkpoints.stable)
      println("[profile] pairs n=" + x.count())
      x
    }
    t("limit-collect 1M probe") { p.limit(1000001).collect().length }

    def runShape(shape: String, pass: Int): Unit = {
      val closure = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
      val edges = t(s"$shape/$pass closure build") {
        val e = (shape match {
          case "old" => closure.distinct().repartition(col("src"))
          case "new" => closure.repartition(col("src")).distinct()
            .sortWithinPartitions("src")
        }).persist(StorageLevel.MEMORY_AND_DISK)
        println(s"[profile] $shape edges n=" + e.count())
        e
      }
      val deg = t(s"$shape/$pass deg build") {
        val base = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        val d = (if (shape == "new") base.sortWithinPartitions("src") else base)
          .persist(StorageLevel.MEMORY_AND_DISK)
        d.count(); d
      }
      var ranks = deg.select(col("src").as("node"), col("deg"),
        lit(1000000L).as("rank_micro"))
      val checkpoints = scala.collection.mutable.Buffer.empty[DataFrame]
      for (i <- 1 to 3) {
        val sums = edges
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst"), expr("rank_micro div deg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("s"))
        val next = deg
          .join(sums.withColumnRenamed("dst", "src"), "src")
          .select(col("src").as("node"), col("deg"),
            (lit(150000L) + expr("(85 * s) div 100")).as("rank_micro"))
        if (i == 1 && pass == 1) {
          println(s"[profile] $shape superstep plan:")
          println(next.queryExecution.executedPlan.toString.take(3000))
        }
        ranks = t(s"$shape/$pass superstep $i") {
          val r = next.localCheckpoint(); r.count(); checkpoints += r; r
        }
      }
      println(s"[profile] $shape/$pass top3 = " + ranks
        .orderBy(col("rank_micro").desc, col("node"))
        .limit(3).collect().mkString(", "))
      edges.unpersist(blocking = true)
      deg.unpersist(blocking = true)
      checkpoints.foreach(
        org.apache.spark.sql.graftbridge.CheckpointBridge.release)
    }
    for (pass <- 1 to passes; shape <- Seq("old", "new"))
      runShape(shape, pass)
    spark.stop()
  }
}
