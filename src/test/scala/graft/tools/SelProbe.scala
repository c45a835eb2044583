package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.queries.Tables.t(spark, dir, "documents")
    val toks = docs.select(col("doc_id").as("_tid"),
      size(array_distinct(split(col("text"), " "))).cast("long").as("_n"))
    val cand = graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text", 16, 4)
      .join(toks.select(col("_tid").as("id_a"), col("_n").as("n_a")), Seq("id_a"))
      .join(toks.select(col("_tid").as("id_b"), col("_n").as("n_b")), Seq("id_b"))
    for (t <- Seq(0.5, 0.95)) {
      val ts = math.round(t * 20000) - 1
      val n = cand.count()
      val kept = cand.filter(least(col("n_a"), col("n_b")) * 20000L >=
        greatest(col("n_a"), col("n_b")) * ts).count()
      println(f"[sel] t=$t cand=$n kept=$kept (${100.0*kept/n}%.1f%%)")
    }
    spark.stop()
  }
}
