package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{BatchQueries, CurationQueries, PipelineQueries, Q, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the training-data
  * pipeline suite) is exposed as a named query over the driver testdata,
  * with an exact DuckDB oracle wherever the capability is
  * SQL-expressible. Streaming (T1–T8), ML (M1–M4) and sink/FS ops
  * (S5–S10) are exercised in ScalaTest (src/test/scala/graft). */
object SparkEntry {

  private val defs: Seq[Q] = {
    val all =
      BatchQueries.all ++ PipelineQueries.all ++ RelationalQueries.all ++ CurationQueries.all
    // a duplicate name would silently drop a query from the Map-backed
    // driver contract — fail loudly instead
    val dups = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    all
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: the
    * `batch_stock` hourly-aggregate shape (SURVEY.md §7.2 step 1). */
  def entry(spark: SparkSession): DataFrame =
    defs.head.build(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.build).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. */
  def oracleSql: Map[String, String] =
    defs.collect { case Q(name, _, Some(sql)) => name -> sql }.toMap
}
