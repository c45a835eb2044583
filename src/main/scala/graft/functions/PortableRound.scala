package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Engine-portable decimal rounding.
  *
  * Spark's `round(x, 2)` applies Java HALF_UP to the exact decimal
  * expansion of the double; DuckDB's `round` rounds the scaled value.
  * On inputs adjacent to a .xx5 boundary the two disagree by one ulp of
  * the target scale (observed on real aggregates: Spark 49.00 vs DuckDB
  * 49.01). `floor(x * 10^n + 0.5) / 10^n` is pure IEEE-double
  * arithmetic, so both engines produce bitwise-identical results given
  * identical inputs — which is what a hash-compared oracle needs.
  * (Semantics: half-up toward +∞; only consistency matters here.)
  */
object PortableRound {

  def round2(c: Column): Column = floor(c * 100.0 + 0.5) / 100.0
  def round4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0

  /** DuckDB mirrors (`x` is a SQL expression string). */
  def sql2(x: String): String = s"(floor(($x) * 100.0 + 0.5) / 100.0)"
  def sql4(x: String): String = s"(floor(($x) * 10000.0 + 0.5) / 10000.0)"
}
