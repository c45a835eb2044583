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
}
