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
}
