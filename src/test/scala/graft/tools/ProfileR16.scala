package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 16): phase-level decomposition of the top bench
  * rows — q126 (pagerank driver-solve path), q117 (incremental
  * clusters), q104 (keep-best tail) — each phase timed with the
  * count/noop discipline inside one JVM, repeated so the steady state
  * is visible. Run: `Test/runMain graft.ProfileR16 [q126|q117|q104] ...` */
object ProfileR16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    val want = if (args.nonEmpty) args.toSet else Set("q126", "q117", "q104")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt

    if (want("q126")) for (r <- 1 to reps) {
      println(s"--- q126 pass $r")
      val pairs = graft.queries.Tables.t(spark, dir, "lineitem")
        .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      val p = time("q126 distinct+stable") {
        val x = pairs.select(col("a").cast("long").as("src"),
          col("b").cast("long").as("dst"))
          .filter(col("src").isNotNull && col("dst").isNotNull)
          .distinct()
          .transform(graft.operators.Checkpoints.stable)
        x
      }
      val head = time("q126 limit-collect")(p.limit(1000001).collect())
      println(s"[prof] q126 edges=${head.length}")
      time("q126 full query") {
        graft.operators.Graph.pageRankUndirectedMicro(pairs, "a", "b", 3).count()
      }
      org.apache.spark.sql.graftbridge.CheckpointBridge.release(p)
    }

    if (want("q117")) for (r <- 1 to reps) {
      println(s"--- q117 pass $r")
      val emb = graft.queries.Tables.t(spark, dir, "embeddings")
      val cut = time("q117 max-id")(
        emb.agg(max(col("vec_id"))).head.getLong(0) * 2 / 3)
      val allPairs = time("q117 allpairs+stable") {
        graft.operators.Checkpoints.stable(
          graft.operators.Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4))
      }
      val base = emb.filter(col("vec_id") <= cut)
      val batch = emb.filter(col("vec_id") > cut)
      val stored = time("q117 stored assign (cold)") {
        val s = graft.operators.Clustering.assignClusters(
          base, "vec_id",
          allPairs.filter(col("id_a") <= cut && col("id_b") <= cut), "id_a", "id_b")
        s.count(); s
      }
      val newPairs = allPairs.filter(col("id_a") > cut || col("id_b") > cut)
      time("q117 mergeIncremental+orderBy") {
        graft.operators.Clustering.mergeIncremental(
          stored, "vec_id", "cluster_id", newPairs, "id_a", "id_b",
          batch, "vec_id").orderBy("vec_id").count()
      }
      org.apache.spark.sql.graftbridge.CheckpointBridge.release(allPairs)
    }

    if (want("q104")) for (r <- 1 to reps) {
      println(s"--- q104 pass $r")
      val docs = graft.queries.Tables.t(spark, dir, "documents")
      val pairs = time("q104 lshVerifiedPairs") {
        val p = graft.operators.Dedup.lshVerifiedPairs(
          docs, "doc_id", "text", 16, 4, 0.95).select("id_a", "id_b")
        println(s"[prof] q104 pairs=${p.count()}"); p
      }
      val clusters = time("q104 assignClusters") {
        val c = graft.operators.Clustering.assignClusters(
          docs, "doc_id", pairs, "id_a", "id_b")
        c.count(); c
      }
      time("q104 members+keepBest") {
        val members = docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tokens"))
          .join(clusters, Seq("doc_id"))
        graft.operators.Clustering.keepBestPerCluster(
          members, "doc_id", "cluster_id", "tokens").orderBy("cluster_id").count()
      }
    }
    spark.stop()
  }
}
