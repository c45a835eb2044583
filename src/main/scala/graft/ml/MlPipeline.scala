package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{GBTRegressionModel, GBTRegressor}
import org.apache.spark.sql.DataFrame

/** Boosted-tree regression pipeline — capabilities M1–M4
  * (SURVEY.md §2.10).
  *
  * Reference: `VectorAssembler` over all-but-label columns
  * (`pyspark/ML_stock.py:195-201`), XGBoost regressor (depth 3, 20/15
  * trees, squared error, `ML_stock.py:204-216`), MAE evaluation
  * (`ML_stock.py:223-236`), HDFS persistence (`ML_stock.py:241`) and
  * streaming-time `transform` (`stream_combined.py:112-128`).
  * xgboost4j is not in the offline jar set; `GBTRegressor` is the
  * idiomatic MLlib gradient-boosted-tree equivalent — capability parity
  * (train/score/save/load), not bit-identical predictions.
  */
object MlPipeline {

  case class TrainResult(model: GBTRegressionModel, maeTrain: Double, maeTest: Double)

  def assemble(df: DataFrame, featureCols: Seq[String], outputCol: String = "features"): DataFrame =
    new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol(outputCol)
      // "skip": a null feature drops ITS row instead of killing the
      // whole query (the default "error" aborted a production stream on
      // one junk message — the lenient parse layer nulls bad fields BY
      // DESIGN, so the assembler must tolerate them)
      .setHandleInvalid("skip")
      .transform(df)

  /** 70/30 split (`ML_stock.py:190`), GBT train, MAE on both splits. */
  def trainRegressor(df: DataFrame, featureCols: Seq[String], labelCol: String,
      maxIter: Int = 20, maxDepth: Int = 3, seed: Long = 42L): TrainResult = {
    // drop rows with nulls in the MODEL's columns only — na.drop over
    // all columns silently discarded rows whose unrelated metadata
    // columns were null
    val assembled = assemble(
      df.na.drop("any", featureCols :+ labelCol), featureCols)
    val Array(train, test) = assembled.randomSplit(Array(0.7, 0.3), seed)
    val gbt = new GBTRegressor()
      .setFeaturesCol("features")
      .setLabelCol(labelCol)
      .setMaxDepth(maxDepth)
      .setMaxIter(maxIter)
      .setSeed(seed)
    val model = gbt.fit(train)
    val eval = new RegressionEvaluator()
      .setLabelCol(labelCol).setPredictionCol("prediction").setMetricName("mae")
    TrainResult(
      model,
      eval.evaluate(model.transform(train)),
      eval.evaluate(model.transform(test)))
  }

  def save(model: GBTRegressionModel, path: String): Unit =
    model.write.overwrite().save(path)

  def load(path: String): GBTRegressionModel = GBTRegressionModel.load(path)

  /** Score with a persisted model — works on batch AND streaming frames
    * (the model embeds into the plan, `stream_combined.py:112-128`). */
  def score(model: GBTRegressionModel, df: DataFrame, featureCols: Seq[String]): DataFrame =
    model.transform(assemble(df, featureCols))
}
