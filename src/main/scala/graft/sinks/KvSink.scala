package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import scala.collection.concurrent.TrieMap

/** Wide-column KV sink contract — capabilities S9/S10 (SURVEY.md §2.1).
  *
  * The reference writes Bigtable rows keyed `"{date}_{hour}"` (batch,
  * `pyspark/batch_stock.py:102-126`) or `"%Y-%m-%d_%H-%M"` (streaming,
  * `stream_combined.py:233`), with per-family string cells, in
  * 5,000-row mutate batches (`batch_stock.py:105`) — via a
  * DRIVER-side `collect()` loop. That shape dies at scale, so the
  * engine keeps the row-key/family/batching CONTRACT but executes the
  * writes on EXECUTORS with `foreachPartition` (batch) /
  * `foreachBatch` (streaming): no driver materialization, parallelism =
  * partitions, 5,000-row client batches preserved per partition.
  */
case class KvRow(key: String, families: Map[String, Map[String, String]])

trait KvStore extends Serializable {
  def mutate(rows: Seq[KvRow]): Unit
}

/** In-memory store for tests (per-JVM; fine on local[*]). */
object InMemoryKvStore extends KvStore {
  val data: TrieMap[String, Map[String, Map[String, String]]] = TrieMap.empty
  override def mutate(rows: Seq[KvRow]): Unit =
    rows.foreach(r => data.put(r.key, r.families))
  def clear(): Unit = data.clear()
}

object KvSink {

  /** In-plan row key `"{date}_{hour}"` (`batch_stock.py:120`). */
  def dateHourKey(date: Column, hour: Column): Column =
    concat(date.cast("string"), lit("_"), hour.cast("string"))

  /** In-plan row key `"%Y-%m-%d_%H-%M"` (`stream_combined.py:233`). */
  def minuteKey(ts: Column): Column = date_format(ts, "yyyy-MM-dd_HH-mm")

  private def toKvRows(rows: Iterator[Row], keyCol: String,
      families: Map[String, Seq[String]]): Iterator[KvRow] =
    rows.map { row =>
      KvRow(
        key = Option(row.getAs[Any](keyCol)).map(_.toString).getOrElse("null"),
        families = families.map { case (fam, cols) =>
          fam -> cols.map(c => c -> Option(row.getAs[Any](c)).map(_.toString).orNull).toMap
        })
    }

  /** Distributed batch write: executor-side, `batchSize`-row client
    * batches (reference contract: 5,000). `onRow` runs per row on the
    * executor — e.g. ticking a LongAccumulator so callers get row
    * counts without re-executing the plan. */
  def writeBatch(df: DataFrame, keyCol: String, families: Map[String, Seq[String]],
      store: KvStore, batchSize: Int = 5000,
      onRow: () => Unit = () => ()): Unit =
    df.foreachPartition { (it: Iterator[Row]) =>
      toKvRows(it, keyCol, families).map { r => onRow(); r }
        .grouped(batchSize).foreach(g => store.mutate(g.toSeq))
    }

  /** Streaming sink: `foreachBatch` + per-microbatch distributed write —
    * the `stream_combined.py:227-256` shape without the driver collect. */
  def streamWriter(keyCol: String, families: Map[String, Seq[String]],
      store: KvStore, batchSize: Int = 5000): (DataFrame, Long) => Unit =
    (batchDf: DataFrame, _: Long) => writeBatch(batchDf, keyCol, families, store, batchSize)
}
