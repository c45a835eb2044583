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
      case l: LogicalRDD =>
        // Not rdd.unpersist(): that logs a WARN for every locally
        // checkpointed RDD ("lineage has been truncated and cannot be
        // recomputed") — a real hazard for a live Dataset, but releasing
        // a DEAD checkpoint is exactly this bridge's contract, and the
        // per-round spam buries genuine warnings in iterative-operator
        // logs. Go straight to the block removal the warning guards.
        val rdd = l.rdd
        // RELIABLE checkpoints hold no blocks — their storage is the
        // checkpoint FILES, which the ContextCleaner deletes only with
        // cleanCheckpoints=true and only after driver GC. An iterative
        // loop releasing each superseded round would otherwise
        // accumulate one file generation per round on DFS for the
        // job's lifetime — the exact leak this bridge exists to stop,
        // in the other storage tier. Same contract: the data is dead.
        rdd.getCheckpointFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          try p.getFileSystem(rdd.sparkContext.hadoopConfiguration)
            .delete(p, true)
          catch { case _: Throwable => () }
        }
        rdd.sparkContext.unpersistRDD(rdd.id, blocking = false)
      case _ => ()
    }
}
