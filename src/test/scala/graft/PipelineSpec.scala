package graft

import org.apache.spark.sql.functions._
import graft.functions.OddsFunctions._
import graft.operators.{Arb, Devig, Ev, Flatten}

/** 1:1 port of the reference pytest oracle
  * (`tests/test_pipeline.py:24-93`) over the same 2-game fixture,
  * plus the flatten variants and V2 standardization rules.
  */
class PipelineSpec extends SparkSpec {

  test("flatten produces 6 rows with the expected columns") {
    val flat = Flatten.flattenOdds(fixtureOdds, "h2h")
    assert(flat.count() == 6) // 3 bookmaker-markets x 2 outcomes
    assert(flat.columns.toSeq == graft.model.Schemas.flattenedColumns)
    val ids = flat.select("game_id").distinct().collect().map(_.getString(0))
    assert(ids.forall(_.contains("_vs_")))
  }

  test("canonical props table pins the 11-column order") {
    val props = Flatten.propsToDataFrame(fixtureOdds, "h2h",
      "2025-01-01T12:00:00Z")
    assert(props.columns.toSeq ==
      graft.model.Schemas.canonicalPropsColumns)
    assert(props.count() == 6)
    assert(props.select("timestamp").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("2025-01-01T12:00:00Z"))
  }

  test("devigged probabilities sum to 1 per game") {
    val probs = Devig.proportional(
      Flatten.flattenOdds(fixtureOdds, "h2h")
        .withColumn("decimal_odds", decimalize(col("price")))
        .withColumn("implied_prob", impliedProb(col("decimal_odds"))))
    val sums = probs.groupBy("game_id")
      .agg(sum("devig_prob").as("s")).collect()
    assert(sums.nonEmpty)
    sums.foreach(r => assert(approx(r.getAs[Double]("s"), 1.0, 1e-9)))
  }

  test("power devig also sums to 1 and shifts toward the favorite") {
    val base = Flatten.flattenOdds(fixtureOdds, "h2h")
      .withColumn("decimal_odds", decimalize(col("price")))
      .withColumn("implied_prob", impliedProb(col("decimal_odds")))
    val probs = Devig.power(base)
    probs.groupBy("game_id").agg(sum("true_prob").as("s")).collect()
      .foreach(r => assert(approx(r.getAs[Double]("s"), 1.0, 1e-9)))
  }

  test("devig guard: non-positive group sum passes implied through") {
    import spark.implicits._
    val df = Seq(("g1", 0.0), ("g1", 0.0)).toDF("game_id", "implied_prob")
    val out = Devig.proportional(df).collect()
    out.foreach(r => assert(r.getAs[Double]("devig_prob") == 0.0))
  }

  test("arbitrage detected for game_001 (~3.26%) and not game_002") {
    val enriched = Devig.proportional(
      Flatten.flattenOdds(fixtureOdds, "h2h")
        .withColumn("price", decimalize(col("price")))
        .withColumn("implied_prob", impliedProb(col("price"))))
    val m = Arb.margins(Arb.bestPrices(enriched))
      .collect().map(r => r.getAs[String]("game_id").take(30) -> r).toMap
    val g1 = m.keys.find(_.contains("Lakers")).get
    val g2 = m.keys.find(_.contains("Nuggets")).get
    // best prices 1.95 + 2.2 => 1 - (1/1.95 + 1/2.2) = 3.26% rounded
    assert(m(g1).getAs[Double]("arbitrage_margin") == 3.26)
    assert(m(g2).isNullAt(m(g2).fieldIndex("arbitrage_margin")))
  }

  test("best price picks the max with deterministic tiebreak") {
    val best = Arb.bestPrices(Flatten.flattenOdds(fixtureOdds, "h2h"))
    val lakers = best.filter(col("outcome") === "Los Angeles Lakers")
      .collect().head
    assert(lakers.getAs[Double]("best_price") == 1.95)
    assert(lakers.getAs[String]("best_bookmaker") == "BookA")
  }

  test("V2 standardize drops invalid prices and adds derived columns") {
    import spark.implicits._
    val games = fixtureOdds
    val std = Flatten.standardizeOdds(games, Seq("h2h"))
    assert(std.count() == 6)
    assert(std.columns.contains("odds_american") &&
      std.columns.contains("implied_prob"))
    // all fixture prices are > 1 decimal, so no rejects
    assert(Flatten.standardizeRejects(games, Seq("h2h")).count() == 0)
  }

  test("EV enrichment flags high-EV rows against devigged probs") {
    val base = Flatten.flattenOdds(fixtureOdds, "h2h")
      .withColumn("price_decimal", decimalize(col("price")))
      .withColumn("implied_prob", impliedProb(col("price_decimal")))
    val enriched = Ev.enrich(Devig.power(base))
    assert(enriched.columns.toSet.intersect(Set("ev", "variance",
      "ev_adj", "kelly_fraction", "bet_flag")).size == 5)
    // margin-free book implies EV <= 0 against its own devigged probs
    // except where line shopping (best odds vs power-devig) creates edge
    val evs = enriched.select("ev").collect().map(_.getDouble(0))
    assert(evs.nonEmpty && evs.forall(e => e > -1 && e < 1))
  }

  test("parseMarket keeps max price per outcome") {
    val flat = Flatten.flattenOdds(fixtureOdds, "h2h")
    val parsed = Flatten.parseMarket(flat)
    assert(parsed.count() == 4) // 2 games x 2 outcomes
    val heat = parsed.filter(col("outcome") === "Miami Heat")
      .collect().head
    assert(heat.getAs[Double]("price") == 2.2)
  }
}
