import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbePR {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime()-t0)/1e9}%.3f s"); r }
    spark.range(1000000).selectExpr("sum(id)").collect()
    val dir = "target/testdata/sf1.0"
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q126_link_pagerank")(spark, dir).count()
      println(f"[probe] full q126 run$i: ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
