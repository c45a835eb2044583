package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Live→historical archival rotation — capabilities S5/S6 and the merge
  * job lifecycle (SURVEY.md §3.2).
  *
  * Reference (`pyspark/merge_stock.py:76-93`): read `live/` parquet →
  * write `historical/<prefix>-<MM-dd-yyyy>.parquet` (overwrite) → delete
  * `live/` files. The reference's sequence is non-atomic (crash after
  * write duplicates data); we harden it with write-then-verify before
  * deleting, per SURVEY.md §7.1.
  */
object ArchiveJob {

  private val stampFmt = DateTimeFormatter.ofPattern("MM-dd-yyyy")

  /** Returns (archived path, row count). */
  def run(spark: SparkSession, liveDir: String, historicalDir: String,
      prefix: String, date: LocalDate = LocalDate.now()): (String, Long) = {
    val df = spark.read.parquet(liveDir)
    val expected = df.count()
    val dest = s"$historicalDir/$prefix-${date.format(stampFmt)}.parquet"
    df.write.mode("overwrite").parquet(dest)

    // verify before destroying the source (hardening vs merge_stock.py:93)
    val written = spark.read.parquet(dest).count()
    require(written == expected, s"archive verify failed: wrote $written, expected $expected")

    val fs = new Path(liveDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(new Path(s"$liveDir/*"))).getOrElse(Array.empty)
      .foreach(st => fs.delete(st.getPath, true))
    (dest, expected)
  }

  /** Date-partitioned archival — the 100 TB layout the single dated
    * file can't provide: one `date_key=.../` hive partition per event
    * date, so readers prune at the DIRECTORY level (a day query scans
    * 1/365th of the archive — the scan's PartitionFilters, not a data
    * filter, do the work) and each day's rotation appends its own
    * partitions via dynamic overwrite without touching earlier ones.
    * Files within a partition are sorted by `sortCol` for row-group
    * min/max pruning on range predicates. */
  def runPartitioned(spark: SparkSession, liveDir: String, historicalDir: String,
      dateCol: String, sortCol: String): Long = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val df = spark.read.parquet(liveDir)
      val expected = df.count()
      df.withColumn("date_key", org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col(dateCol)))
        .sortWithinPartitions(sortCol)
        .write.mode("overwrite")
        .partitionBy("date_key")
        .parquet(historicalDir)
      val written = spark.read.parquet(historicalDir).count()
      require(written >= expected,
        s"partitioned archive verify failed: $written < $expected")
      val fs = new Path(liveDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      Option(fs.globStatus(new Path(s"$liveDir/*"))).getOrElse(Array.empty)
        .foreach(st => fs.delete(st.getPath, true))
      expected
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
