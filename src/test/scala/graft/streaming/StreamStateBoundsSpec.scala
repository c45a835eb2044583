package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** State BOUNDEDNESS under sustained load — the streaming counterpart
  * of the batch scale sweep. The specs elsewhere assert watermark
  * semantics (what is emitted when); this one asserts the 100 TB
  * property: state-store row counts stay ~(active keys × open
  * windows/sessions) while the stream processes many times that many
  * distinct rows — i.e. watermark EVICTION actually reclaims state,
  * so a long-lived query's memory is bounded by rate × delay, not by
  * stream lifetime. Measured from the engine's own
  * `StreamingQueryProgress.stateOperators.numRowsTotal`, not inferred
  * from output. A regression that silently stops evicting (lost
  * watermark, wrong timeout conf) fails these asserts after ~12
  * batches instead of failing an on-call pager at week two. */
class StreamStateBoundsSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val rounds = 12
  private val users = 40

  private def t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  /** Max state rows any progress entry reported for `q`. */
  private def maxStateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal)) match {
      case rs if rs.nonEmpty => rs.max
      case _ => 0L
    }

  test("watermarked dedup state is bounded by the watermark horizon, not stream length") {
    val in = MemoryStream[(Timestamp, String)]
    val dedup = StreamDedup.dedup(
      in.toDF().toDF("ts", "key"), "ts", "10 seconds", Seq("key"))
    val q = dedup.writeStream.format("memory").queryName("bounds_dedup")
      .outputMode(OutputMode.Append()).start()
    // each round: the same `users` keys, 60 s later — every row is a
    // distinct (key, ts), so without eviction state grows by
    // users × round
    for (r <- 0 until rounds) {
      in.addData((0 until users).map(u =>
        (new Timestamp(t0 + r * 60000L), s"u$u")): _*)
      q.processAllAvailable()
    }
    q.stop()
    val processed = rounds.toLong * users // 480 distinct state keys seen
    spark.table("bounds_dedup").count() shouldBe processed
    val peak = maxStateRows(q)
    // eviction horizon = 10 s watermark on 60 s strides ⇒ ≲ 2 rounds
    // of keys live at once (current batch + not-yet-advanced watermark)
    peak should be <= 3L * users
    peak.toDouble / processed should be < 0.3
  }

  test("timeoutSessions keeps ~one open session per key while emitting many") {
    val in = MemoryStream[(String, Timestamp, Double)]
    val sessions = StatefulOps.timeoutSessions(
      in.toDF().toDF("key", "ts", "value"), "key", "ts", "value",
      delay = "5 seconds", gapSec = 30)
    val q = sessions.writeStream.format("memory").queryName("bounds_sessions")
      .outputMode(OutputMode.Append()).start()
    // each round is a burst 120 s after the previous (> gap 30 s):
    // every round closes the prior round's session per key, so total
    // sessions ≈ rounds × users while OPEN state stays ≈ users
    for (r <- 0 until rounds) {
      in.addData((0 until users).map(u =>
        (s"u$u", new Timestamp(t0 + r * 120000L), 1.0)): _*)
      q.processAllAvailable()
    }
    q.stop()
    val emitted = spark.table("bounds_sessions").count()
    emitted should be >= (rounds - 1).toLong * users
    // state keys = keys holding any open sub-session ⇒ ≈ users, never
    // rounds × users (each key's closed sessions left the store)
    maxStateRows(q) should be <= 2L * users
  }

  test("tumbling aggregate state holds open windows only, closed ones evict") {
    val in = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamAgg.tumbling(
      in.toDF().toDF("ts", "key", "value"), "ts", delay = "10 seconds",
      duration = "1 minute", Seq("key"), Seq(sum(col("value")).as("total")))
    val q = agg.writeStream.format("memory").queryName("bounds_tumbling")
      .outputMode(OutputMode.Append()).start()
    // one window per key per round; rounds stride one full window
    for (r <- 0 until rounds) {
      in.addData((0 until users).map(u =>
        (new Timestamp(t0 + r * 60000L), s"u$u", 1.0)): _*)
      q.processAllAvailable()
    }
    q.stop()
    // windows processed = rounds × users; only the last ~2 strides'
    // windows may still be open (watermark 10 s behind the max event)
    spark.table("bounds_tumbling").count() should be >= (rounds - 2).toLong * users
    maxStateRows(q) should be <= 3L * users
  }
}
