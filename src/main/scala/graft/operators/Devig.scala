package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Devigging: remove the bookmaker margin from implied probabilities.
  *
  * Both variants are grouped row-preserving normalizations (pandas
  * `groupby().transform`), which on Spark are window aggregates over
  * `partitionBy(group)` — a single shuffle on the group key, no join,
  * no row-order dependence. Catalyst collapses consecutive windows
  * with identical partitioning into one exchange (SURVEY §4).
  *
  *   - A1 proportional devig: `src/processing.py:117-124`
  *   - A5 power devig (power=1.05):
  *     `Sports-Pipeline-V2/odds_utils.py:237-262`
  */
object Devig {

  /** A1: `devig_prob = implied / sum(implied) per group`, with the
    * reference's guard: a group whose sum is <= 0 (or null) passes the
    * implied prob through unchanged (`src/processing.py:120-124`) —
    * never divides by zero.
    */
  def proportional(df: DataFrame, probCol: String = "implied_prob",
                   groupCols: Seq[String] = Seq("game_id"),
                   outCol: String = "devig_prob"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    val total = sum(col(probCol)).over(w)
    df.withColumn(outCol,
      when(total.isNull || total <= 0, col(probCol))
        .otherwise(col(probCol) / total))
  }

  /** A5: power-method devig (`odds_utils.py:237-251`):
    *   1. `norm = p / sum(p)` per group (pass-through when sum <= 0);
    *   2. `adj = norm ^ (1/power)`, power=1.05;
    *   3. `true_prob = adj / sum(adj)` per group (fall back to `norm`
    *      when the adjusted sum <= 0).
    * Two window passes over the same partitioning — one shuffle.
    */
  def power(df: DataFrame, probCol: String = "implied_prob",
            groupCols: Seq[String] = Seq("game_id"),
            powerParam: Double = 1.05,
            outCol: String = "true_prob"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    val totalP = sum(col(probCol)).over(w)
    val norm = when(totalP.isNull || totalP <= 0, col(probCol))
      .otherwise(col(probCol) / totalP)
    val adj = pow(norm, 1.0 / powerParam)
    val withAdj = df
      .withColumn("__norm", norm)
      .withColumn("__adj", adj)
    val totalAdj = sum(col("__adj")).over(w)
    withAdj.withColumn(outCol,
      when(totalAdj.isNull || totalAdj <= 0, col("__norm"))
        .otherwise(col("__adj") / totalAdj))
      .drop("__norm", "__adj")
  }
}
