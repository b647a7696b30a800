package graft.forecast

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{LinearRegression, RandomForestRegressor}
import org.apache.spark.ml.{PipelineModel, Pipeline}
import org.apache.spark.sql.DataFrame

/** Forecasting surface (M2/M3, `src/modeling.py:11-29`) on MLlib.
  *
  * The reference trains sklearn `LinearRegression` /
  * `RandomForestRegressor(n_estimators=100, random_state=42)` on the
  * three rolling-average features; the Spark-native twin is a
  * `VectorAssembler` + MLlib estimator pipeline (distributed fit, no
  * driver-side matrix).
  */
object Models {

  val defaultFeatures: Seq[String] = Seq(
    "points_rolling_avg", "rebounds_rolling_avg", "assists_rolling_avg")

  /** M2: `"linear"` or `"random_forest"` (100 trees, seed 42);
    * anything else throws IllegalArgumentException, matching the
    * reference's ValueError (`src/modeling.py:21-23`).
    */
  def train(df: DataFrame, modelType: String = "linear",
            featureCols: Seq[String] = defaultFeatures,
            labelCol: String = "target_points"): PipelineModel = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val estimator = modelType match {
      case "linear" =>
        new LinearRegression().setFeaturesCol("features")
          .setLabelCol(labelCol)
      case "random_forest" =>
        new RandomForestRegressor().setFeaturesCol("features")
          .setLabelCol(labelCol).setNumTrees(100).setSeed(42)
      case other =>
        throw new IllegalArgumentException(s"Unknown model type: $other")
    }
    new Pipeline().setStages(Array(assembler, estimator)).fit(df)
  }

  /** M3: adds a `prediction` column. */
  def predict(model: PipelineModel, df: DataFrame): DataFrame =
    model.transform(df)
}
