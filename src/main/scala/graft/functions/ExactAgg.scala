package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact, engine-portable aggregation arithmetic.
  *
  * Double summation is order-dependent: Spark's partial aggregation and
  * DuckDB's parallel aggregation associate differently, so `sum(double)`
  * can differ in the last ulp between engines — and a hash-compared
  * oracle needs bitwise equality. The fix is to sum in DECIMAL(18,6):
  * the double→decimal cast is deterministic (both engines round the
  * binary value to the nearest 6-decimal; ties would need the double to
  * sit exactly on a 5e-7 boundary, unreachable for real data), and
  * decimal addition is exact, hence order-independent.
  *
  * Averages then divide the exact sum (cast back to double — also
  * deterministic) by the non-null count with one IEEE division, and
  * round with [[PortableRound]] so both engines apply the identical
  * float algorithm. Every helper has a DuckDB SQL mirror that produces
  * the bitwise-identical value.
  *
  * Scale note: decimal(18,6) sums widen to decimal(28,6) internally —
  * hash-aggregate friendly, partial-combine still applies, no codegen
  * loss. Inputs must be < 1e12 in magnitude (all testdata measures are).
  */
object ExactAgg {

  private val Dec = "decimal(18,6)"

  /** Exact order-independent sum of a double measure. try_cast, not
    * cast: under Spark 4's default ANSI mode, cast(NaN/Infinity/|x|≥1e12
    * AS DECIMAL) throws and one junk record would abort the whole
    * aggregate; try_cast skips it as null (the DuckDB mirrors use
    * TRY_CAST for the identical semantics). */
  def sumDec(c: Column): Column = sum(c.try_cast(Dec))

  /** sum rounded to 2dp, bitwise-portable. */
  def sum2(c: Column): Column = PortableRound.round2(sumDec(c).cast("double"))

  /** avg (null-skipping) rounded to 2dp, bitwise-portable. The
    * denominator counts the same try_cast'd values as the numerator sum,
    * so junk records the cast drops (NaN/Infinity/|x|≥1e12) are excluded
    * from BOTH — this is "avg of the included values", not sum-of-good
    * over count-of-all. */
  def avg2(c: Column): Column =
    PortableRound.round2(sumDec(c).cast("double") / count(c.try_cast(Dec)))

  /** Unrounded exact-sum average — for intermediates that feed further
    * aggregation (e.g. avg-of-avgs fine level). Same numerator/denominator
    * pairing as [[avg2]]. */
  def avgExact(c: Column): Column =
    sumDec(c).cast("double") / count(c.try_cast(Dec))

  // ---- DuckDB mirrors (x is a SQL expression string) ----

  def sumDecSql(x: String): String = s"sum(TRY_CAST($x AS DECIMAL(18,6)))"

  def sum2Sql(x: String): String =
    PortableRound.sql2(s"CAST(${sumDecSql(x)} AS DOUBLE)")

  private def countDecSql(x: String): String =
    s"count(TRY_CAST($x AS DECIMAL(18,6)))"

  def avg2Sql(x: String): String =
    PortableRound.sql2(s"(CAST(${sumDecSql(x)} AS DOUBLE) / ${countDecSql(x)})")

  def avgExactSql(x: String): String =
    s"(CAST(${sumDecSql(x)} AS DOUBLE) / ${countDecSql(x)})"
}
