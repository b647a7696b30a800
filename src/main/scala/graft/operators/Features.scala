package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Player-feature pipeline (M1, `src/features.py:3-23`).
  *
  * pandas `rolling(5, min_periods=1).mean()` ≡ `avg` over
  * `rowsBetween(-4, 0)` — Spark's `avg` already averages over however
  * many rows the frame holds, so the short head windows need no special
  * case (SURVEY §7.4). One shuffle on the partition key covers all
  * window columns.
  */
object Features {

  /** A6 (×N stats) + A7 + P6: rolling 5-row means per partition key
    * ordered by `orderCol`, next-row `target` via `lead`, trailing
    * null-target rows dropped. `tieBreak` pins ordering when `orderCol`
    * has duplicates (Spark sorts are otherwise non-deterministic there).
    */
  def build(df: DataFrame,
            partitionCol: String = "player",
            orderCol: String = "date",
            statCols: Seq[String] = Seq("points", "rebounds", "assists"),
            targetCol: String = "points",
            windowSize: Int = 5,
            tieBreak: Seq[String] = Nil): DataFrame = {
    val ordering = (col(orderCol) +: tieBreak.map(col)).map(_.asc)
    val wOrdered = Window.partitionBy(col(partitionCol)).orderBy(ordering: _*)
    val wRolling = wOrdered.rowsBetween(-(windowSize - 1), 0)
    val withRolling = statCols.foldLeft(df) { (acc, c) =>
      acc.withColumn(s"${c}_rolling_avg", avg(col(c)).over(wRolling))
    }
    withRolling
      .withColumn(s"target_$targetCol", lead(col(targetCol), 1).over(wOrdered))
      .na.drop(Seq(s"target_$targetCol"))
  }
}
