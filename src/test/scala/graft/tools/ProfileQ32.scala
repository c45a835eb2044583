package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileQ32 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    val emb = graft.queries.Tables.t(spark, dir, "embeddings")
    val pairs = graft.operators.Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4)
    time("pairs_count")(pairs.count())
    time("pairs_count_again")(pairs.count())
    val p = time("pairs_checkpoint")(pairs.localCheckpoint())
    time("cc")(graft.operators.Clustering.connectedComponents(p, "id_a", "id_b").count())
    time("cc_again")(graft.operators.Clustering.connectedComponents(p, "id_a", "id_b").count())
    time("assign_full")(graft.operators.Clustering.assignClusters(emb, "vec_id", pairs, "id_a", "id_b").count())
    spark.stop()
  }
}
