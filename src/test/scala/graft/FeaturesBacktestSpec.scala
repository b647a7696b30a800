package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.{Backtest, Features}

/** M1/M4/M5 semantics: rolling-5 with min_periods=1, lead target with
  * trailing-null drop (`src/features.py`), fixed-stake backtest and
  * accuracy (`src/evaluation.py`).
  */
class FeaturesBacktestSpec extends SparkSpec {
  import spark.implicits._

  private def gameLog = Seq(
    ("a", Date.valueOf("2025-01-01"), 10.0, 5.0, 2.0),
    ("a", Date.valueOf("2025-01-02"), 20.0, 7.0, 4.0),
    ("a", Date.valueOf("2025-01-03"), 30.0, 9.0, 6.0),
    ("b", Date.valueOf("2025-01-01"), 8.0, 1.0, 1.0),
    ("b", Date.valueOf("2025-01-02"), 12.0, 3.0, 3.0)
  ).toDF("player", "date", "points", "rebounds", "assists")

  test("rolling mean includes the current row, short head windows avg") {
    val f = Features.build(gameLog)
    val a = f.filter($"player" === "a").orderBy("date").collect()
    // first row: avg(10) = 10; second row: avg(10,20) = 15
    assert(a(0).getAs[Double]("points_rolling_avg") == 10.0)
    assert(a(1).getAs[Double]("points_rolling_avg") == 15.0)
  }

  test("lead target drops the last row per player") {
    val f = Features.build(gameLog)
    assert(f.count() == 3) // 5 rows - 2 trailing per player
    val a = f.filter($"player" === "a").orderBy("date").collect()
    assert(a(0).getAs[Double]("target_points") == 20.0)
    assert(a(1).getAs[Double]("target_points") == 30.0)
  }

  test("backtest labels and bankroll match the reference fold") {
    // pred > line && pred > 0.55 => win; pred < line && 1-pred > 0.55
    // => loss; else pass
    val df = Seq(
      (0.60, 0.50), // win
      (0.30, 0.40), // loss (1-0.3=0.7 > 0.55)
      (0.56, 0.60), // 0.56 < 0.6, 1-0.56=0.44 < 0.55 => pass
      (0.70, 0.65)  // win
    ).toDF("pred", "line")
    val labeled = Backtest.label(df)
    assert(labeled.select("bet_result").collect().map(_.getString(0)).toSeq
      == Seq("win", "loss", "pass", "win"))
    val s = Backtest.summarize(labeled).collect().head
    assert(s.getAs[Long]("wins") == 2 && s.getAs[Long]("losses") == 1)
    assert(s.getAs[Double]("bankroll") == 1010.0)
    assert(approx(s.getAs[Double]("roi"), 0.01))
  }

  test("accuracy = mean of (pred >= .5) == outcome") {
    val df = Seq((0.7, 1), (0.4, 0), (0.6, 0), (0.2, 1))
      .toDF("pred", "outcome")
    val acc = Backtest.accuracy(df).collect().head.getAs[Double]("accuracy")
    assert(approx(acc, 0.5))
  }
}
