package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Shared plan-shaping helpers for the engine's operators. */
object Plans {

  /** The session's shuffle fan-out — used with explicit-N
    * `repartition(n)` (exempt from AQE coalescing) to keep CPU-heavy,
    * small-byte stages parallel. One definition so every operator
    * agrees on the fallback. */
  def shufflePartitions(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** Optionally broadcast the build side of a self-join. `true` (the
    * default in the pair operators) is right while the build side fits
    * the broadcast limit — it removes blocking-key skew entirely.
    * Pass `false` at corpus scale: the join falls back to a shuffle
    * hash/sort-merge join planned by Catalyst (pair skew then wants
    * [[graft.operators.SkewJoin]]-style salting on hot keys). */
  def maybeBroadcast(df: DataFrame, enabled: Boolean): DataFrame =
    if (enabled) broadcast(df) else df

  /** THE broadcast-safety gate, in one place: true iff an estimated
    * `nRows × bytesPerRow` relation fits the session's
    * `autoBroadcastJoinThreshold` (and broadcasting isn't disabled,
    * threshold -1). Every size-gated stored-reference probe
    * (bm25TopKStored's postings, the media band frames, q169's
    * corpus-half digest sets) reads the threshold and compares through
    * this helper, so the gate semantics can't drift between call
    * sites; only the PER-ROW MODEL is site-specific (each relation's
    * schema is different — see [[hashedDigestRowBytes]] and the
    * callers' own constants). Forced broadcasts above the limit are
    * the driver/executor-OOM class the gate exists to prevent; above
    * it, callers fall back to Catalyst's shuffle join. */
  def underBroadcastGate(nRows: Long, bytesPerRow: Long): Boolean = {
    val limit =
      org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    limit > 0 && nRows * bytesPerRow <= limit
  }

  /** Per-row estimate for a broadcast relation of hashed digests (one
    * int64 hash + id + hashed-relation overhead) — the model q169's
    * substring-screen reference and the digest-set probes share. */
  val hashedDigestRowBytes = 48L

  /** Driver-side parquet row count: sum the footer record counts of a
    * stored artifact's files without scheduling a Spark job. The
    * broadcast GATES only need the artifact's row count, and a
    * `count()` job costs two scheduler round trips per gate read —
    * measured 0.30 s of the q169 ingest gate's warm invocation for two
    * ~40 k-row digest sets whose footers answer in milliseconds.
    * Reads the files on EVERY call (nothing cached across runs); flat
    * artifact directories only (the stored digest/posting layouts —
    * no partition subdirectories). */
  def parquetRowCount(spark: org.apache.spark.sql.SparkSession,
      path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
  }
}
