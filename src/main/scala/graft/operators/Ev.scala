package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.OddsFunctions._

/** EV enrichment pipeline (`Sports-Pipeline-V2/ev_calculator.py:48-66`
  * plus the `widgets_ui.py:34-61` high-EV view).
  *
  * The reference computes these with a per-row pandas `apply` lambda;
  * here they are native column expressions inside one projection —
  * whole-stage-codegen'd, no UDF, no row materialization.
  */
object Ev {

  /** X11 + X6..X10: adds `true_prob` (null-filled from implied),
    * `ev`, `variance`, `ev_adj`, `kelly_fraction`, `bet_flag`.
    * Expects `price_decimal`, `implied_prob`, optional `true_prob`.
    */
  def enrich(df: DataFrame, lambdaRisk: Double = 0.5,
             kellyCap: Double = 0.05,
             evThreshold: Double = 0.02): DataFrame = {
    val withTrue =
      if (df.columns.contains("true_prob"))
        df.withColumn("true_prob",
          coalesce(col("true_prob"), col("implied_prob")))
      else df.withColumn("true_prob", col("implied_prob"))
    withTrue
      .withColumn("ev", expectedValue(col("true_prob"), col("price_decimal")))
      .withColumn("variance",
        outcomeVariance(col("true_prob"), col("price_decimal"), col("ev")))
      .withColumn("ev_adj", adjustedEv(col("ev"), col("variance"), lambdaRisk))
      .withColumn("kelly_fraction",
        halfKelly(col("true_prob"), col("price_decimal"), kellyCap))
      .withColumn("bet_flag", betFlag(col("ev"), evThreshold))
  }

  /** P5 + O3 + X15: the high-EV display table (`widgets_ui.py:52-61`) —
    * `ev >= threshold`, ranked by adjusted EV, with the decision label.
    */
  def highEv(enriched: DataFrame, evThreshold: Double = 0.02): DataFrame =
    enriched
      .filter(col("ev") >= evThreshold)
      .withColumn("decision", decisionLabel(col("bet_flag")))
      .orderBy(col("ev_adj").desc)
}
