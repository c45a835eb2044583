package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Releases the block-manager storage behind a `localCheckpoint()`ed
  * Dataset. `Dataset.unpersist` only uncaches CacheManager entries, so a
  * checkpointed RDD's blocks otherwise live until the ContextCleaner
  * happens to GC the reference — a slow leak for iterative algorithms
  * that checkpoint every round on a long-lived driver. Safe to call once
  * the data is no longer needed (any later action on the Dataset would
  * fail, since a local checkpoint's lineage is truncated). */
object CheckpointBridge {
  def release(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
