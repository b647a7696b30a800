package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Best-price selection and arbitrage detection.
  *
  *   - A2/A3 grouped argmax (best price per game+outcome):
  *     `src/analysis.py:68-70`, `web/app.py:39-43`
  *   - A4 arbitrage margin with the exactly-two-outcome guard (P8):
  *     `src/analysis.py:39-52,64-94`, `web/app.py:44-48`
  *
  * pandas `idxmax` keeps the first row in frame order on ties; Spark
  * row order is not stable, so the tiebreak is pinned to the lowest
  * bookmaker (SURVEY §7.4) — deterministic under any partitioning, and
  * the DuckDB oracle uses the same ORDER BY.
  */
object Arb {

  /** A2: one row per (game_id, outcome): the max-price row with its
    * bookmaker. Delegates to [[graft.operators.Flatten.parseMarket]] —
    * ONE home for the grouped-argmax window and its pinned tiebreak
    * (price desc, bookmaker asc; SURVEY §7.4) — then applies the
    * summary-shape renames.
    */
  def bestPrices(df: DataFrame, priceCol: String = "price"): DataFrame =
    Flatten.parseMarket(df, priceCol)
      .withColumnRenamed("bookmaker", "best_bookmaker")
      .withColumnRenamed(priceCol, "best_price")

  /** A4: per-game arbitrage summary over best-price rows.
    * `total = Σ implied_prob` of the best prices; margin defined only
    * when the market has exactly 2 outcomes (P8, `src/analysis.py:44-45`)
    * and `total < 1`; reported as `(1-total)*100` rounded to 2
    * (`src/analysis.py:51`). Emits the `web/app.py:50-71` summary shape.
    */
  def margins(bestPriceRows: DataFrame,
              impliedCol: String = "implied_prob"): DataFrame =
    bestPriceRows
      .groupBy(col("game_id"))
      .agg(
        first(col("home_team")).as("home_team"),
        first(col("away_team")).as("away_team"),
        sum(col(impliedCol)).as("total_implied"),
        count(lit(1)).as("n_outcomes"))
      .withColumn("arbitrage_margin",
        when(col("n_outcomes") === 2 && col("total_implied") < 1,
          round((lit(1.0) - col("total_implied")) * 100.0, 2)))

  /** Full flagship summary (`web/app.py:36-71`): best price rows joined
    * back to per-game margins. The margins side is one row per game —
    * unbounded at scale, so the join strategy is left to Catalyst/AQE
    * (it broadcasts when the aggregate is actually small, and falls
    * back to a shuffle join when "one row per game" means terabytes).
    * Both sides already share hash-partitioning on game_id from the
    * window/groupBy, so the shuffle case adds no extra exchange.
    */
  def summary(flattened: DataFrame,
              impliedCol: String = "implied_prob"): DataFrame = {
    val best = bestPrices(flattened)
    val m = margins(best, impliedCol)
      .select("game_id", "total_implied", "n_outcomes", "arbitrage_margin")
    best.join(m, Seq("game_id"), "left")
  }
}
