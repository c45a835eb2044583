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
  * loss. Inputs must be < 1e12 in magnitude for the FIRST-moment
  * helpers (all testdata measures are). The SECOND-moment helpers
  * (varSamp2/stddevSamp2/covarSamp2/corr4) square the values before
  * summing: x² is decimal(37,12) and Σx² is capped at decimal(38,12)
  * (≈1e26 of integer headroom), so their effective input bound is
  * tighter — |x| ≤ ~1e9 over ~1e8 rows. Past it the aggregate throws
  * under ANSI (Spark 4's default) rather than returning a wrong
  * variance; re-scale the measure first if your data is that large.
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

  // ---- Second-moment statistics from exact sums ----
  //
  // stddev/variance/corr/covar are NOT portable as built-ins: both
  // engines use streaming merge formulas whose float rounding depends
  // on association order. Instead the engine computes the classic
  // sum-of-squares formulas from DECIMAL-exact sums: every Σx, Σx²,
  // Σxy is exact (order-independent), and the final double expression
  // is evaluated with the IDENTICAL operation tree in the SQL mirror —
  // IEEE ops are deterministic, so the result is bitwise-portable.
  // (The cancellation sensitivity of the textbook formula is neutralized
  // by the exact sums — cancellation error comes from inexact partial
  // sums, which decimal arithmetic eliminates; the single final
  // subtraction is correctly rounded.) Rows where any input fails the
  // decimal cast are excluded from ALL sums and the count alike.

  private def validBoth(a: Column, b: Column): Column =
    a.try_cast(Dec).isNotNull && b.try_cast(Dec).isNotNull

  /** Sample variance from exact sums: (Σx² − (Σx)²/n) / (n−1), 2dp. */
  def varSamp2(c: Column): Column = {
    val d = c.try_cast(Dec)
    val s1 = sum(d).cast("double")
    val s2 = sum(d * d).cast("double")
    val n = count(d).cast("double")
    PortableRound.round2((s2 - s1 * s1 / n) / (n - lit(1.0)))
  }

  /** Sample standard deviation from exact sums, 2dp. */
  def stddevSamp2(c: Column): Column = {
    val d = c.try_cast(Dec)
    val s1 = sum(d).cast("double")
    val s2 = sum(d * d).cast("double")
    val n = count(d).cast("double")
    PortableRound.round2(sqrt((s2 - s1 * s1 / n) / (n - lit(1.0))))
  }

  /** Sample covariance from exact sums over rows where BOTH inputs cast
    * cleanly (numerator and denominator agree on the row set), 2dp. */
  def covarSamp2(x: Column, y: Column): Column = {
    val v = validBoth(x, y)
    val xd = when(v, x.try_cast(Dec)); val yd = when(v, y.try_cast(Dec))
    val sx = sum(xd).cast("double"); val sy = sum(yd).cast("double")
    val sxy = sum(xd * yd).cast("double")
    val n = count(when(v, lit(1))).cast("double")
    PortableRound.round2((sxy - sx * sy / n) / (n - lit(1.0)))
  }

  /** Pearson correlation from exact sums (same row-set discipline), 4dp. */
  def corr4(x: Column, y: Column): Column = {
    val v = validBoth(x, y)
    val xd = when(v, x.try_cast(Dec)); val yd = when(v, y.try_cast(Dec))
    val sx = sum(xd).cast("double"); val sy = sum(yd).cast("double")
    val sxx = sum(xd * xd).cast("double"); val syy = sum(yd * yd).cast("double")
    val sxy = sum(xd * yd).cast("double")
    val n = count(when(v, lit(1))).cast("double")
    PortableRound.round4(
      (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))
  }

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

  // Moment mirrors: the same exact-sum + identical-double-tree scheme as
  // the Scala side. `d(x)` is the decimal-cast input; n counts the same
  // cast-included rows as every sum.

  private def dSql(x: String): String = s"TRY_CAST($x AS DECIMAL(18,6))"

  /** DuckDB keeps DECIMAL(18,·) in int64 and OVERFLOWS on 18×18
    * multiplication instead of widening; casting one step up to
    * DECIMAL(19,6) promotes the product to int128 DECIMAL(38,12) —
    * still exact, same value as Spark's decimal(37,12) product.
    * Validity (which rows the stats include) is still judged at
    * (18,6), matching the Scala side. */
  private def dWideSql(x: String): String = s"CAST(${dSql(x)} AS DECIMAL(19,6))"

  def varSamp2Sql(x: String): String = {
    val (s1, s2) = (s"CAST(sum(${dSql(x)}) AS DOUBLE)",
      s"CAST(sum(${dWideSql(x)} * ${dWideSql(x)}) AS DOUBLE)")
    val n = s"CAST(count(${dSql(x)}) AS DOUBLE)"
    PortableRound.sql2(s"(($s2 - $s1 * $s1 / $n) / ($n - 1.0))")
  }

  def stddevSamp2Sql(x: String): String = {
    val (s1, s2) = (s"CAST(sum(${dSql(x)}) AS DOUBLE)",
      s"CAST(sum(${dWideSql(x)} * ${dWideSql(x)}) AS DOUBLE)")
    val n = s"CAST(count(${dSql(x)}) AS DOUBLE)"
    PortableRound.sql2(s"sqrt(($s2 - $s1 * $s1 / $n) / ($n - 1.0))")
  }

  private def validBothSql(x: String, y: String): String =
    s"(${dSql(x)} IS NOT NULL AND ${dSql(y)} IS NOT NULL)"

  def covarSamp2Sql(x: String, y: String): String = {
    val v = validBothSql(x, y)
    def vd(e: String) = s"CASE WHEN $v THEN ${dWideSql(e)} END"
    val sx = s"CAST(sum(${vd(x)}) AS DOUBLE)"
    val sy = s"CAST(sum(${vd(y)}) AS DOUBLE)"
    val sxy = s"CAST(sum(${vd(x)} * ${vd(y)}) AS DOUBLE)"
    val n = s"CAST(count(CASE WHEN $v THEN 1 END) AS DOUBLE)"
    PortableRound.sql2(s"(($sxy - $sx * $sy / $n) / ($n - 1.0))")
  }

  def corr4Sql(x: String, y: String): String = {
    val v = validBothSql(x, y)
    def vd(e: String) = s"CASE WHEN $v THEN ${dWideSql(e)} END"
    val sx = s"CAST(sum(${vd(x)}) AS DOUBLE)"
    val sy = s"CAST(sum(${vd(y)}) AS DOUBLE)"
    val sxx = s"CAST(sum(${vd(x)} * ${vd(x)}) AS DOUBLE)"
    val syy = s"CAST(sum(${vd(y)} * ${vd(y)}) AS DOUBLE)"
    val sxy = s"CAST(sum(${vd(x)} * ${vd(y)}) AS DOUBLE)"
    val n = s"CAST(count(CASE WHEN $v THEN 1 END) AS DOUBLE)"
    PortableRound.sql4(
      s"(($n * $sxy - $sx * $sy) / (sqrt($n * $sxx - $sx * $sx) * sqrt($n * $syy - $sy * $sy)))")
  }
}
