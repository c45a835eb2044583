package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(17)
  private val df = (1 to 20000)
    .map(i => (s"g${i % 2}", s"u${rnd.nextInt(5000)}", rnd.nextDouble() * 100))
    .toDF("g", "user", "v")

  test("approxDistinct is within rsd of the exact distinct count per group") {
    val exact = df.groupBy("g").agg(countDistinct("user").as("d"))
      .as[(String, Long)].collect().toMap
    val approx = Sketches.approxDistinct(df, Seq("g"), "user", rsd = 0.02)
      .as[(String, Long)].collect().toMap
    approx.keySet shouldBe exact.keySet
    exact.foreach { case (g, d) =>
      approx(g).toDouble shouldBe d.toDouble +- d * 0.06 // 3×rsd head-room
    }
  }

  test("approxQuantiles brackets the true median") {
    val got = Sketches.approxQuantiles(df, Seq("g"), "v", Seq(0.1, 0.5, 0.9))
      .as[(String, Seq[Double])].collect().toMap
    got.values.foreach { qs =>
      qs should have length 3
      qs(0) should be < qs(1)
      qs(1) shouldBe 50.0 +- 5.0 // uniform [0,100) median
      qs(1) should be < qs(2)
    }
  }

  test("merged HLL partials estimate the global distinct without re-reading data") {
    // stage 1: one sketch per (g, bucket) — the "per-day partials"
    val partials = Sketches.hllPartials(
      df.withColumn("bucket", (rand(7) * 10).cast("int")), Seq("g", "bucket"), "user")
    partials.count() shouldBe 20 // 2 groups × 10 buckets
    // stage 2: merge per group; estimate must track the exact count
    val merged = Sketches.hllMerge(partials, Seq("g"))
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("g").agg(countDistinct("user").as("d"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, d) =>
      merged(g).toDouble shouldBe d.toDouble +- d * 0.1
    }
  }
}
