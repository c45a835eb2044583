package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions: the engine's native expressions surfaced as SQL
  * functions through SparkSessionExtensions (the (c) extension path —
  * registered, not just Column-API-wrapped). Extensions bind at session
  * build time, so the shared test session must be cleared first —
  * getOrCreate would silently return it with no extensions applied —
  * and restored after. */
class ExtensionsSpec extends SparkSpec {

  test("extensions register sorted_intersect_size and cosine_similarity for spark.sql") {
    val shared = spark // force-init the shared session/context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()

      val n = s.sql(
        "SELECT sorted_intersect_size(array('a','b','c'), array('b','c','d')) AS n")
        .collect().head.getInt(0)
      n shouldBe 2
      val c = s.sql(
        "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
        .collect().head.getDouble(0)
      c shouldBe 1.0
      // codegen'd null semantics: mismatched lengths → null
      s.sql("SELECT cosine_similarity(array(1.0d), array(1.0d, 2.0d)) AS c")
        .collect().head.isNullAt(0) shouldBe true
      // md5_hash32 matches DuckDB's mirror value for a known input:
      // md5('abc') = 900150983cd24fb0..., first 8 hex = 0x90015098
      s.sql("SELECT md5_hash32('abc') AS h")
        .collect().head.getLong(0) shouldBe 0x90015098L
      // the plain session must NOT have the function (registration is
      // per-session, not global)
      intercept[Exception] {
        shared.sql("SELECT sorted_intersect_size(array('a'), array('a'))").collect()
      }
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("IntervalJoinRewrite plans a keyless |a-b|<=tol theta-join as a bucketed equi-join") {
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s.implicits._
      import org.apache.spark.sql.functions.{abs, col, lit}

      // includes bucket-boundary-crossing (14 vs 17) and negative
      // (−2 vs 1) pairs, so floor-division bucketing is exercised
      val data = Seq((1L, 10L), (2L, 13L), (3L, 100L), (4L, 102L),
        (5L, 200L), (6L, 14L), (7L, 17L), (8L, -2L), (9L, 1L))
      val ev = data.toDF("id", "t")
      val a = ev.select(col("id").as("id_a"), col("t").as("t_a"))
      val b = ev.select(col("id").as("id_b"), col("t").as("t_b"))
      val joined = a.join(b,
        abs(col("t_a") - col("t_b")) <= lit(5L) && col("id_a") < col("id_b"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      optimized should include("_graft_bucket")
      val physical = joined.queryExecution.executedPlan.toString
      physical should not include "NestedLoop"
      physical should not include "Cartesian"

      val expected = (for {
        (i, ti) <- data; (jj, tj) <- data
        if i < jj && math.abs(ti - tj) <= 5L
      } yield (i, jj)).sorted
      joined.select("id_a", "id_b").as[(Long, Long)].collect().sorted shouldBe expected

      // guard: a join that already has an equi key is left alone
      val keyed = a.join(b,
        col("id_a") === col("id_b") && abs(col("t_a") - col("t_b")) <= lit(5L))
      keyed.queryExecution.optimizedPlan.toString should not include "_graft_bucket"

      // property: rewritten results == brute force on random timelines
      // (ScalaCheck isn't in the offline cache — fixed-seed manual gen)
      val rnd = new scala.util.Random(20260812L)
      for (trial <- 1 to 3) {
        val tol = 1L + rnd.nextInt(7)
        val pts = (1 to 60).map(i => (i.toLong, rnd.nextLong() % 100))
        val pa = pts.toDF("id", "t").select(col("id").as("ia"), col("t").as("ta"))
        val pb = pts.toDF("id", "t").select(col("id").as("ib"), col("t").as("tb"))
        val got = pa.join(pb, abs(col("ta") - col("tb")) <= lit(tol) && col("ia") < col("ib"))
        withClue(s"trial $trial tol $tol: ") {
          got.queryExecution.optimizedPlan.toString should include("_graft_bucket")
          val expect = (for {
            (i, ti) <- pts; (jj, tj) <- pts
            if i < jj && math.abs(ti - tj) <= tol
          } yield (i, jj)).sorted
          got.select("ia", "ib").as[(Long, Long)].collect().sorted shouldBe expect
        }
      }
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
