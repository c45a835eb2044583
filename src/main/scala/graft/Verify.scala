package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev-only subset filter (comma-separated name prefixes); the
    // driver never sets it, so its runs stay full-surface.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def keep(name: String): Boolean =
      only.forall(_.exists(p => name.startsWith(p)))
    // Dev-only output-width knob for the upscale gates: coalesce(1)
    // (the driver-compatible single-file default) also collapses the
    // final COMPUTE stage to one thread — at sf10 the ~600M-row pair
    // queries would verify nearly single-threaded. SPARK_GRAFT_OUT_PARTS
    // switches to repartition(n): the shuffle barrier keeps the
    // upstream stage at full width and writes n files (the checker
    // globs *.parquet; the driver never sets this, so its artifact
    // shape is untouched). NOTE: repartition discards the queries'
    // ORDER BY, so dumps written this way must be checked
    // order-insensitively (the checker's --agghash mode).
    val outParts = sys.env.get("SPARK_GRAFT_OUT_PARTS").flatMap(_.toIntOption)
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val shaped = outParts match {
          case Some(n) => df.repartition(n)
          case None => df.coalesce(1)
        }
        shaped.write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
