package graft

import org.apache.spark.sql.functions._
import graft.functions.OddsFunctions._
import graft.operators.{Arb, Devig, Flatten}

/** The FIXTURES.md §1 "additional variants" the reference's own tests
  * never cover (SURVEY §7.4 semantic traps): alternate outcome/price
  * key spellings, null prices, decimal <= 1 (V2 skip rule), 3-outcome
  * markets (two-outcome guard), market-key filtering, and the
  * synthetic-game-id fallback when the API id is null.
  */
class VariantFixtureSpec extends SparkSpec {

  private def variants =
    spark.read.schema(graft.model.Schemas.oddsSchema)
      .json(getClass.getResource("/sample_odds_variants.json").getPath)

  test("price and outcome coalesce across alternate key spellings") {
    val flat = Flatten.flattenOdds(variants, "h2h")
      .filter(col("bookmaker") === "BookC")
    val rows = flat.collect().map(r =>
      r.getAs[String]("outcome") -> r.getAs[Double]("price")).toMap
    // odds/price_decimal keys and outcome/outcome_name keys all land
    assert(rows == Map("Alpha" -> 1.9, "Beta" -> 2.05))
  }

  test("V2 flatten coalesces team key and falls back to synthetic id") {
    val flat = Flatten.flattenMarket(variants, "h2h")
      .filter(col("bookmaker") === "BookE")
    val rows = flat.collect()
    assert(rows.map(_.getAs[String]("outcome")).toSet ==
      Set("Epsilon", "Zeta"))
    // id is null in the fixture -> synthetic {home}_vs_{away}_{time}
    assert(rows.forall(_.getAs[String]("game_id") ==
      "Epsilon_vs_Zeta_2025-02-03T00:00:00Z"))
  }

  test("null prices survive V1 flatten, get dropped by V2 standardize") {
    val v1 = Flatten.flattenOdds(variants, "h2h")
    assert(v1.count() == 7) // nulls kept (pandas-NaN semantics)
    assert(v1.filter(col("price").isNull).count() == 1)
    val v2 = Flatten.standardizeOdds(variants, Seq("h2h"))
    // null price and 0.8 (<= 1) both rejected
    assert(v2.filter(col("game_id") === "game_102").count() == 1)
    val rejects = Flatten.standardizeRejects(variants, Seq("h2h"))
    // 4 rejects: game_102's null + 0.8 rows, PLUS game_101's two rows —
    // V2's _flatten_market reads only the `price` key
    // (odds_utils.py:203), so `odds`/`price_decimal` spellings are
    // V1-only fallbacks and V2 treats those rows as priceless
    assert(rejects.count() == 4)
  }

  test("null implied probs don't poison the devig group sum") {
    val probs = Devig.proportional(
      Flatten.flattenOdds(variants, "h2h")
        .withColumn("price", decimalize(col("price")))
        .withColumn("implied_prob", impliedProb(col("price"))))
    val g102 = probs.filter(col("game_id").contains("Gamma"))
      .agg(sum("devig_prob")).collect().head.getDouble(0)
    // window sum ignores the null row; non-null rows still sum to 1
    assert(approx(g102, 1.0))
  }

  test("three-outcome market fails the two-outcome arb guard") {
    val enriched = Devig.proportional(
      Flatten.flattenOdds(variants, "h2h")
        .withColumn("price", decimalize(col("price")))
        .withColumn("implied_prob", impliedProb(col("price"))))
    val m = Arb.margins(Arb.bestPrices(enriched)).collect()
      .map(r => r.getAs[String]("game_id") -> r).toMap
    val gamma = m.keys.find(_.contains("Gamma")).get
    // 3 outcomes -> margin must be null no matter the prices
    assert(m(gamma).getAs[Long]("n_outcomes") == 3)
    assert(m(gamma).isNullAt(m(gamma).fieldIndex("arbitrage_margin")))
  }

  test("market filter drops non-matching markets before explode") {
    val totals = Flatten.flattenOdds(variants, "totals")
    assert(totals.count() == 1)
    assert(totals.collect().head.getAs[String]("outcome") == "Over")
    assert(Flatten.flattenOdds(variants, "spreads").count() == 0)
  }
}
