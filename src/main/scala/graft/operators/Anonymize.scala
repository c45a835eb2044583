package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity by suppression — the release-side privacy gate that
  * complements `Redact`'s content-side PII scrub.
  *
  * A row is re-identifiable when its quasi-identifier (QI) combination
  * is rare: if only three documents share (lang, source), those three
  * users hide in a crowd of three. [[kAnonymize]] masks the QI columns
  * of every row whose QI group has fewer than k members, so every
  * released non-masked combination is shared by ≥ k rows.
  *
  * Scale shape: one aggregate over the QI columns whose result is
  * QI-CARDINALITY-sized (thousands of combos, not corpus-sized),
  * broadcast back into a map-side join — the corpus itself never
  * shuffles. This is the same tiny-dimension-broadcast discipline as
  * `Sampling.capPerGroup`'s pre-filter.
  *
  * Caveat (documented, standard for suppression-only k-anonymity): the
  * masked rows collectively form one residual "*" group; if fewer than
  * k rows were masked IN TOTAL, drop them (`dropResidual = true`)
  * instead of releasing them.
  */
object Anonymize {

  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Int,
      star: String = "*", dropResidual: Boolean = false): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 1, "k must be >= 1")
    val counts = df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("_qi_n"))
    // null-SAFE join back: groupBy counts null QI values as their own
    // group, but an equi-join (null != null) would silently DROP every
    // null-QI row from the release — the opposite of a privacy gate's
    // job
    val renamed = counts.select(
      qiCols.map(c => col(c).as(s"_q_$c")) :+ col("_qi_n"): _*)
    val joined = df.join(broadcast(renamed),
        qiCols.map(c => col(c) <=> col(s"_q_$c")).reduce(_ && _))
      .drop(qiCols.map(c => s"_q_$c"): _*)
    // released QI columns are STRINGLY by design: the mask token shares
    // the column with the surviving values, so non-string QI columns
    // are cast rather than silently promoted by the when()
    val masked = qiCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c,
        when(col("_qi_n") < k, lit(star)).otherwise(col(c).cast("string")))
    }
    val flagged = masked
      .withColumn("suppressed", col("_qi_n") < k)
      .drop("_qi_n")
    if (!dropResidual) flagged
    else {
      // residual total is another tiny broadcastable scalar
      val residual = flagged.filter(col("suppressed"))
        .agg(count(lit(1)).as("_res_n"))
      flagged.crossJoin(broadcast(residual))
        .filter(!col("suppressed") || col("_res_n") >= k)
        .drop("_res_n")
    }
  }
}
