package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only: decompose the stored substring probe's warm cost —
  * nominate (rolling digests + semi join), candidate fold, exact md5
  * verify, span stats — against the q169 artifact at the bench SF. */
object ProfileSubstring {
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
    SparkEntry.queries("q169_ingest_gate")(spark, dir).count()
    System.setProperty("graft.bench.reuseArtifacts", "true")

    val sDir = s"${System.getProperty("java.io.tmpdir")}/graft_q169_ss_" +
      java.lang.Integer.toHexString(dir.hashCode)
    val k = spark.read.parquet(s"$sDir/meta").head().getAs[Number]("k").intValue()
    val docs = graft.queries.Tables.t(spark, dir, "documents")
      .filter(col("doc_id") % 2 === 1)
      .filter(col("text").isNotNull)
    val refRoll = spark.read.parquet(s"$sDir/roll")
    val refExact = spark.read.parquet(s"$sDir/exact")

    def time(label: String)(f: => Long): Unit = {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[profss] $label%-34s run$r ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      }
    }

    val rollPos = docs
      .select(col("doc_id"), posexplode(graft.functions.RollingHashWindowsCol.of(col("text"), k))
        .as(Seq("_p0", "_d")))
      .select(col("doc_id"), (col("_p0") + 1).as("pos"), col("_d"))
    time("digests only (noop)") {
      docs.select(graft.functions.RollingHashWindowsCol.of(col("text"), k).as("d"))
        .write.format("noop").mode("overwrite").save(); 0L
    }
    time("nominate: explode+semijoin") {
      rollPos.join(broadcast(refRoll.select(col("_d"))), Seq("_d"), "left_semi").count()
    }
    val cand = rollPos
      .join(broadcast(refRoll.select(col("_d"))), Seq("_d"), "left_semi")
      .groupBy(col("doc_id")).agg(collect_list(col("pos")).as("_ps"))
    time("+ candidate fold (collect_list)") { cand.count() }
    val exact = docs.join(cand, Seq("doc_id"))
      .select(col("doc_id"), graft.functions.ArrayOps.bind(split(col("text"), " ")) { toks =>
        transform(col("_ps"), p => struct(p.as("pos"),
          md5(concat_ws(" ", slice(toks, p, lit(k)))).as("_h")))
      }.as("_pe"))
      .select(col("doc_id"), explode(col("_pe")).as("_x"))
      .select(col("doc_id"), col("_x.pos").as("pos"), col("_x._h").as("_h"))
    time("+ exact md5 of candidates") {
      exact.write.format("noop").mode("overwrite").save(); 0L
    }
    time("+ exact semijoin (full verify)") {
      exact.join(broadcast(refExact.select(col("_h"))), Seq("_h"), "left_semi").count()
    }
    time("full probe incl spanStats") {
      Dedup.dupSpansRollingAgainstStored(spark, sDir, docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
