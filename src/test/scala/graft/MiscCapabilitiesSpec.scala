package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Small SURVEY.md §2 capabilities not naturally covered elsewhere:
  * S8 console stream sink + T6 bounded run, S11 literal-DF date stamp,
  * the `coalesce` scalar (§2.3). */
class MiscCapabilitiesSpec extends SparkSpec {
  import spark.implicits._

  test("S8/T6: console sink stream starts, runs bounded, stops (stream_stock.py:72-74)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Int]
    val q = in.toDF().writeStream.format("console")
      .outputMode(OutputMode.Append()).start()
    in.addData(1, 2, 3)
    q.processAllAvailable()
    // T6: bounded wait instead of indefinite blocking
    q.awaitTermination(100) shouldBe false // still running at timeout
    q.stop()
    q.awaitTermination(5000) shouldBe true
  }

  test("QueryMetrics listener records completed actions with durations") {
    val m = new graft.jobs.QueryMetrics().register(spark)
    try {
      Seq(1, 2, 3).toDF("v").filter(col("v") > 1).count() shouldBe 2
      // listener callbacks are asynchronous on the listener bus
      val deadline = System.currentTimeMillis() + 30000
      while (m.entries.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val e = m.entries
      e should not be empty
      e.head.action shouldBe "count"
      e.head.durationNs should be > 0L
      e.head.error shouldBe None
    } finally m.unregister(spark)
  }

  test("StreamMetrics listener captures batch progress and the event-time watermark") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = new graft.jobs.StreamMetrics
    spark.streams.addListener(m)
    try {
      val in = MemoryStream[(Timestamp, Int)]
      val agg = in.toDF().toDF("ts", "v")
        .withWatermark("ts", "10 seconds")
        .groupBy(window(col("ts"), "1 minute")).count()
      val q = agg.writeStream.format("memory").queryName("sm_probe")
        .outputMode(OutputMode.Update()).start()
      in.addData((ts("2024-01-01 00:10:00"), 1))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:11:00"), 2)) // advances the watermark
      q.processAllAvailable()
      q.stop()
      val deadline = System.currentTimeMillis() + 30000
      while (!m.progresses.exists(_.numInputRows > 0) &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      val got = m.progresses.filter(_.queryName == "sm_probe")
      got.map(_.numInputRows).sum shouldBe 2
      // the second batch's watermark reflects the first batch's max event time
      got.flatMap(_.watermark).exists(_.startsWith("2024-01-01T00:09:50")) shouldBe true
    } finally spark.streams.removeListener(m)
  }

  test("Trigger.AvailableNow drains the backlog and terminates on its own") {
    val dir = tmpDir("availnow")
    val src = s"$dir/src"
    Seq(1, 2, 3).toDF("v").write.parquet(src)
    val q = spark.readStream.schema("v INT").parquet(src)
      .writeStream.format("memory").queryName("avail_now")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    // processes existing files then STOPS — the batch-over-backlog
    // pattern (no manual stop, unlike the reference's bounded run)
    q.awaitTermination(60000) shouldBe true
    spark.table("avail_now").as[Int].collect().sorted shouldBe Array(1, 2, 3)
  }

  test("S11: current-date string via a 1-row DataFrame (merge_stock.py:81-84)") {
    val stamp = spark.range(1)
      .select(date_format(current_date(), "MM-dd-yyyy").as("d"))
      .as[String].first()
    stamp should fullyMatch regex """\d{2}-\d{2}-\d{4}"""
  }

  test("coalesce fills event time from a fallback column (stream_stock.py:65 intent)") {
    val df = Seq(
      (Some(ts("2024-01-01 10:00:00")), ts("2024-01-01 10:00:05")),
      (None, ts("2024-01-01 11:00:05")))
      .toDF("datetime", "publish_timestamp")
      .select(coalesce(col("datetime"), col("publish_timestamp")).as("t"))
    df.as[Timestamp].collect() shouldBe Array(
      ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:05"))
  }

  test("S7: file-based streaming source feeds the parse pipeline") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("filestream")
    val target = StructType(Seq(
      StructField("sym", StringType), StructField("price", DoubleType)))
    // a file landing in the watched directory IS the stream
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/batch0.json"),
      """{"payload": "{\"sym\":\"AAPL\",\"price\":\"12.5\"}"}""")
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("payload", StringType))))
      .json(dir)
    val parsed = graft.streaming.StreamParse.parse(stream, "payload", target)
    val q = parsed.writeStream.format("memory").queryName("s7_file")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    spark.table("s7_file").as[(String, Double)].collect() shouldBe Array(("AAPL", 12.5))
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
}

/** The stored-artifact build discipline shared by every stored-index/
  * model query (q84/q88/q97/q101/q113/q115/q116/q118/q122/q124/q129/
  * q132/q133): clean-dir rebuild by default; bench pass-2 reuse only
  * behind the JVM property AND a completion marker. */
class ArtifactsPrepareSpec extends SparkSpec {
  import graft.queries.Artifacts

  private def writeMarkerDir(dir: String, tag: String): Unit = {
    import spark.implicits._
    Seq(tag).toDF("tag").write.mode("overwrite").parquet(s"$dir/data")
  }
  private def readTag(dir: String): String =
    spark.read.parquet(s"$dir/data").collect().head.getString(0)

  test("prepare rebuilds from a clean dir by default, even when output exists") {
    val dir = tmpDir("artifacts") + "/a"
    Artifacts.prepare(spark, dir) { writeMarkerDir(dir, "v1") }
    readTag(dir) shouldBe "v1"
    var ran = false
    Artifacts.prepare(spark, dir) { writeMarkerDir(dir, "v2"); ran = true }
    ran shouldBe true
    readTag(dir) shouldBe "v2"
  }

  test("prepare skips the rebuild only with the bench property AND a marker") {
    val dir = tmpDir("artifacts") + "/b"
    Artifacts.prepare(spark, dir) { writeMarkerDir(dir, "v1") }
    System.setProperty("graft.bench.reuseArtifacts", "true")
    try {
      var ran = false
      Artifacts.prepare(spark, dir) { writeMarkerDir(dir, "v2"); ran = true }
      ran shouldBe false          // marker present -> artifact reused
      readTag(dir) shouldBe "v1"
    } finally System.clearProperty("graft.bench.reuseArtifacts")
  }

  test("memo rebuilds by default; reuses a prior full-pass value only under the property") {
    // The driver-side twin of prepare (q150/q151's trained centers):
    // default path ALWAYS rebuilds (Verify semantics), property path
    // returns the value a full pass stored in this JVM.
    val key = s"memo-spec:${System.nanoTime()}"
    var builds = 0
    Artifacts.memo(key) { builds += 1; Seq(builds) } shouldBe Seq(1)
    Artifacts.memo(key) { builds += 1; Seq(builds) } shouldBe Seq(2) // no property -> rebuilt
    System.setProperty("graft.bench.reuseArtifacts", "true")
    try {
      Artifacts.memo(key) { builds += 1; Seq(builds) } shouldBe Seq(2) // reused
      builds shouldBe 2
      // a key never built in this JVM still builds under the property
      Artifacts.memo(key + ":other") { builds += 1; Seq(builds) } shouldBe Seq(3)
    } finally System.clearProperty("graft.bench.reuseArtifacts")
  }

  test("a failed build leaves no marker, so the next run rebuilds even under reuse") {
    val dir = tmpDir("artifacts") + "/c"
    an[RuntimeException] should be thrownBy
      Artifacts.prepare(spark, dir) {
        writeMarkerDir(dir, "half")           // partial output lands...
        throw new RuntimeException("boom")    // ...then the build dies
      }
    System.setProperty("graft.bench.reuseArtifacts", "true")
    try {
      Artifacts.prepare(spark, dir) { writeMarkerDir(dir, "good") }
      readTag(dir) shouldBe "good"  // half-built artifact was NOT reused
    } finally System.clearProperty("graft.bench.reuseArtifacts")
  }
}
