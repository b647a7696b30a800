package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strategy evaluation (M4/M5, `src/evaluation.py:10-39`).
  *
  * The reference's backtest iterates `zip(predictions, lines)` with a
  * fixed $10 stake from a $1000 bankroll — the fixed stake makes the
  * fold order-independent, so the distributed form is a per-row label
  * projection plus one global aggregate (SURVEY §7.4 / A13). No
  * driver-side loop, no `collect`.
  */
object Backtest {

  /** A13 per-row bet labels: `pred > line && pred > threshold` ⇒ win;
    * `pred < line && (1-pred) > threshold` ⇒ loss; else pass
    * (`src/evaluation.py:19-27`).
    */
  def label(df: DataFrame, predCol: String = "pred",
            lineCol: String = "line",
            threshold: Double = 0.55): DataFrame =
    df.withColumn("bet_result",
      when(col(predCol) > col(lineCol) && col(predCol) > threshold, "win")
        .when(col(predCol) < col(lineCol) &&
          (lit(1.0) - col(predCol)) > threshold, "loss")
        .otherwise("pass"))

  /** A13 summary: final bankroll `1000 + 10*(wins - losses)` and
    * `roi = (bankroll - 1000)/1000` (`src/evaluation.py:28-31`).
    */
  def summarize(labeled: DataFrame, startBankroll: Double = 1000.0,
                stake: Double = 10.0): DataFrame = {
    // coalesce: sum over ZERO rows is null, but the reference's fold
    // over an empty bet list returns bankroll=start, roi=0
    def n(c: org.apache.spark.sql.Column) = coalesce(sum(c), lit(0L))
    val wins = n(when(col("bet_result") === "win", 1).otherwise(0))
    val losses = n(when(col("bet_result") === "loss", 1).otherwise(0))
    val passes = n(when(col("bet_result") === "pass", 1).otherwise(0))
    labeled.agg(
      wins.as("wins"), losses.as("losses"), passes.as("passes"))
      .withColumn("bankroll",
        lit(startBankroll) + lit(stake) * (col("wins") - col("losses")))
      .withColumn("roi", (col("bankroll") - startBankroll) / startBankroll)
  }

  /** A12 accuracy: `mean((pred >= 0.5) == outcome)`
    * (`src/evaluation.py:33-39`). `outcomeCol` is 0/1.
    */
  def accuracy(df: DataFrame, predCol: String = "pred",
               outcomeCol: String = "outcome"): DataFrame =
    df.agg(avg(
      ((col(predCol) >= 0.5) === (col(outcomeCol) === 1)).cast("int"))
      .as("accuracy"))
}
