package graft.jobs

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Production observability: a QueryExecutionListener that records one
  * entry per completed action — action name, wall duration, the root
  * operator's output-row metric when present, and the failure message
  * otherwise. At fleet scale this is the feed for per-query SLO
  * dashboards and regression alerting; here it is the same mechanism,
  * session-registered and spec-tested.
  *
  * Entries accumulate in a lock-free queue (listener callbacks arrive
  * on the listener-bus thread); `entries` snapshots without draining so
  * a long-lived session can both alert and batch-export. */
class QueryMetrics extends QueryExecutionListener {

  final case class Entry(
      action: String,
      durationNs: Long,
      outputRows: Option[Long],
      error: Option[String])

  private val log = new ConcurrentLinkedQueue[Entry]()

  private def rootRows(qe: QueryExecution): Option[Long] =
    qe.executedPlan.metrics.get("numOutputRows").map(_.value)

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    log.add(Entry(funcName, durationNs, rootRows(qe), None))

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    log.add(Entry(funcName, -1L, None, Some(exception.getMessage)))

  def entries: Seq[Entry] = log.iterator().asScala.toSeq

  /** Register on a session; returns this for chained use. */
  def register(spark: SparkSession): QueryMetrics = {
    spark.listenerManager.register(this)
    this
  }

  def unregister(spark: SparkSession): Unit =
    spark.listenerManager.unregister(this)
}

/** Streaming-side observability: per-micro-batch progress snapshots —
  * input rows, processing rate, and the event-time watermark (the
  * stream-SLO signal: a stalled watermark means state is accumulating
  * and downstream emission has stopped). Register via
  * `spark.streams.addListener(new StreamMetrics)`. */
class StreamMetrics extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._

  final case class Progress(
      queryName: String,
      batchId: Long,
      numInputRows: Long,
      watermark: Option[String],
      droppedByWatermark: Long)

  private val log = new ConcurrentLinkedQueue[Progress]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    log.add(Progress(
      Option(p.name).getOrElse(p.id.toString),
      p.batchId,
      p.numInputRows,
      Option(p.eventTime.get("watermark")),
      p.stateOperators.map(_.numRowsDroppedByWatermark).sum))
  }

  def progresses: Seq[Progress] = log.iterator().asScala.toSeq

  /** Stream-SLO checks over the recorded progresses of `queryName`:
    * the event-time watermark must only move forward (a regressing or
    * stalled watermark means state growth and stopped emission), and —
    * for pipelines sized so late data fits the lateness bound — no rows
    * may be dropped at the watermark. Returns the violations (empty =
    * healthy), so callers can alert or assert. */
  def sloViolations(queryName: String): Seq[String] = {
    val ps = progresses.filter(_.queryName == queryName).sortBy(_.batchId)
    // Compare as Instants, not strings: lexicographic order is only safe
    // while Spark emits uniform fixed-width ISO-8601 (mixed precision,
    // e.g. with/without millis, would misorder). Keep the string for the
    // message; an unparseable watermark is itself a violation.
    val wms = ps.flatMap(_.watermark).map { s =>
      s -> scala.util.Try(java.time.Instant.parse(s)).toOption
    }
    val unparseable = wms.collect {
      case (s, None) => s"unparseable watermark: $s"
    }
    val instants = wms.collect { case (s, Some(i)) => (s, i) }
    val regressions = instants.zip(instants.drop(1)).collect {
      case ((sa, a), (sb, b)) if b.isBefore(a) => s"watermark regressed: $sa -> $sb"
    }
    val dropped = ps.filter(_.droppedByWatermark > 0).map(p =>
      s"batch ${p.batchId} dropped ${p.droppedByWatermark} late rows")
    unparseable ++ regressions ++ dropped
  }
}
