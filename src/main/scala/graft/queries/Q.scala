package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability instantiated over the driver testdata,
  * with an optional DuckDB oracle (SURVEY.md §5.1). Queries without an
  * oracle get the driver's weaker rows-only check. */
case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  import org.apache.spark.sql.functions.expr
  import org.apache.spark.sql.types.LongType

  /** Read a testdata table. `events.ts` is TIMESTAMP(NANOS) parquet,
    * which Spark 4 only reads via the nanos-as-long legacy conf; we set
    * it at runtime (it is a dynamic SQL conf) and rebuild the µs-truncated
    * timestamp — all engine queries use second-or-coarser granularity, so
    * truncation is semantics-neutral vs the ns-native oracle. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else df
  }
}
