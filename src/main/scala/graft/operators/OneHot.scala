package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Conditional one-hot encoding with a residual class — capability P8
  * (SURVEY.md §2.2).
  *
  * Reference: `when(x == v, 1).otherwise(0)` per known category plus a
  * residual `*_other` flag set when all indicators are zero
  * (`pyspark/ML_stock.py:104-119`, `ML_tomtom.py:110-125`,
  * `stream_combined.py:89-104`); the row-wise indicator sum mirrors the
  * Python `reduce(add, ...)` at `ML_stock.py:116`.
  *
  * Pure narrow projection — no shuffle, fully codegen'd; scale-free.
  */
object OneHot {

  /** Sanitize a category value into a column-name suffix. */
  private def slug(v: String): String =
    v.toLowerCase.replaceAll("[^a-z0-9]+", "_").replaceAll("(^_|_$)", "")

  /** Add one `<prefix>_<class>` 0/1 column per known class and a
    * `<prefix>_other` residual (1 iff no known class matched). */
  def encode(df: DataFrame, colName: String, classes: Seq[String], prefix: String): DataFrame = {
    // an empty class list would .reduce on an empty indicator seq at
    // plan build (the Side(oneHotCol = Some(...)) default-args trap) —
    // fail with the real cause instead
    require(classes.nonEmpty, s"one-hot over '$colName' needs a non-empty class list")
    val indicators: Seq[(String, Column)] = classes.map { v =>
      s"${prefix}_${slug(v)}" -> when(col(colName) === lit(v), 1L).otherwise(0L)
    }
    val withInd = indicators.foldLeft(df) { case (acc, (name, c)) => acc.withColumn(name, c) }
    val indSum = indicators.map(_._2).reduce(_ + _)
    withInd.withColumn(s"${prefix}_other", when(indSum === 0L, 1L).otherwise(0L))
  }
}
