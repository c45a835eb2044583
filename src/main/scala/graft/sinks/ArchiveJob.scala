package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{coalesce, lit}
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

  /** Small-file compaction: rewrite a parquet dir into ~`targetRows`-row
    * files. Long-running ingestion accretes one file per micro-batch /
    * task; at archive scale the resulting millions of KB-files dominate
    * job startup (footer reads, scheduling, NameNode/liststore load), so
    * periodic compaction is a first-class maintenance op. Writes to
    * `<dir>.compact-tmp`, verifies the row count, then swaps (delete +
    * rename — verify happens BEFORE the source is destroyed, matching
    * [[run]]'s discipline; a crash between the two leaves the data
    * intact in the tmp dir). Returns (files before, files after, rows).
    *
    * Operates on ONE leaf directory: for a hive-partitioned archive,
    * compact each partition path individually — rewriting the root
    * would fold the partition column into the data files and destroy
    * the layout (guarded below). */
  /** Targeted deletion: rewrite a parquet dir WITHOUT the rows matching
    * `predicate` (the right-to-be-forgotten / bad-source purge shape —
    * parquet files are immutable, so deletion is a filtered rewrite).
    * Same crash-safe order as [[compact]]: write the survivors to a tmp
    * dir, verify surviving + deleted = original, then swap. Returns
    * (rows deleted, rows kept). For hive-partitioned archives run it
    * per partition path — or prune first and rewrite only partitions
    * that can contain matches. */
  def deleteWhere(spark: SparkSession, dir: String,
      predicate: org.apache.spark.sql.Column): (Long, Long) = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df = spark.read.parquet(dir)
    val total = df.count()
    val tmp = s"$dir.delete-tmp"
    df.filter(!coalesce(predicate, lit(false))).write.mode("overwrite").parquet(tmp)
    val kept = spark.read.parquet(tmp).count()
    val matched = df.filter(coalesce(predicate, lit(false))).count()
    require(kept + matched == total,
      s"deleteWhere verify failed: kept $kept + deleted $matched != $total")
    fs.delete(new Path(dir), true)
    require(fs.rename(new Path(tmp), new Path(dir)), s"deleteWhere rename failed for $dir")
    (matched, kept)
  }

  def compact(spark: SparkSession, dir: String, targetRows: Long): (Int, Int, Long) = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partitionDirs = Option(fs.globStatus(new Path(s"$dir/*=*")))
      .getOrElse(Array.empty).filter(_.isDirectory)
    require(partitionDirs.isEmpty,
      s"$dir is hive-partitioned (${partitionDirs.head.getPath.getName}, ...); " +
        "compact each partition directory instead")
    def parquetFiles(p: String): Int =
      Option(fs.globStatus(new Path(s"$p/*.parquet"))).map(_.length).getOrElse(0)
    val before = parquetFiles(dir)
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRows).toInt)
    val tmp = s"$dir.compact-tmp"
    // repartition(n) (round-robin) balances rows across exactly n files;
    // coalesce(n) would skip the shuffle but inherits upstream skew and
    // can't split large partitions.
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp)
    val written = spark.read.parquet(tmp).count()
    require(written == rows, s"compact verify failed: wrote $written, expected $rows")
    fs.delete(new Path(dir), true)
    require(fs.rename(new Path(tmp), new Path(dir)), s"compact rename failed for $dir")
    (before, parquetFiles(dir), rows)
  }
}
