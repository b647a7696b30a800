package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.OddsFunctions._

/** Nested odds JSON → tidy row tables.
  *
  * Re-expresses the reference's triple-nested Python loops
  * (games → bookmakers → markets → outcomes) as a declarative
  * `explode` chain Catalyst can prune/push through:
  *   - F1 `props_to_dataframe`  `src/ingestion.py:71-119`
  *   - F2 `flatten_odds_to_df`  `src/processing.py:27-70`
  *   - F3 `_flatten_market`     `Sports-Pipeline-V2/odds_utils.py:182-206`
  *   - F4 `standardize_odds`    `Sports-Pipeline-V2/odds_utils.py:209-234`
  *
  * Input is a DataFrame with `graft.model.Schemas.oddsSchema`.
  */
object Flatten {

  /** Shared explode chain: one row per (game, bookmaker, market-filtered,
    * outcome). Market filtering happens BEFORE the outcomes explode so
    * Catalyst prunes non-matching markets early (P1,
    * `src/ingestion.py:89-90`).
    */
  private def explodeChain(games: DataFrame, marketKey: String): DataFrame =
    games
      .select(col("*"), explode(col("bookmakers")).as("bk"))
      .select(col("*"), explode(col("bk.markets")).as("mkt"))
      .filter(col("mkt.key") === marketKey)
      .select(col("*"), explode(col("mkt.outcomes")).as("o"))

  /** F1: canonical 11-column player-props table, column order pinned
    * (`src/ingestion.py:105-118`). `batchTimestamp` is the injected
    * ingestion time — a literal per batch, deterministic for tests
    * (`src/ingestion.py:76`; SURVEY §7.4).
    */
  def propsToDataFrame(games: DataFrame, marketKey: String,
                       batchTimestamp: String): DataFrame =
    explodeChain(games, marketKey).select(
      lit(batchTimestamp).as("timestamp"),
      col("id").as("game_id"),
      col("commence_time"),
      col("home_team"),
      col("away_team"),
      col("bk.title").as("bookmaker"),
      col("bk.last_update").as("last_update"),
      col("o.description").as("player_name"),
      col("mkt.key").as("market"),
      col("o.point").as("line"),
      col("o.price").as("price"))

  /** F2: flattened odds table with synthetic `game_id`
    * (`{home}_vs_{away}_{commence}`, `src/processing.py:38`), price
    * coalesced across `price`/`odds`/`price_decimal`
    * (`src/processing.py:52`), outcome coalesced across
    * `name`/`outcome`/`outcome_name` (`:62`), and post-hoc numeric
    * coercion of price (`:68-69`).
    */
  def flattenOdds(games: DataFrame, marketKey: String): DataFrame =
    explodeChain(games, marketKey).select(
      syntheticGameId(col("home_team"), col("away_team"),
        col("commence_time")).as("game_id"),
      col("sport_key").as("sport"),
      col("commence_time"),
      col("home_team"),
      col("away_team"),
      col("bk.title").as("bookmaker"),
      col("bk.last_update").as("last_update"),
      col("mkt.key").as("market"),
      coalesce(col("o.name"), col("o.outcome"), col("o.outcome_name"))
        .as("outcome"),
      numericCoerce(
        coalesce(col("o.price"), col("o.odds"), col("o.price_decimal")))
        .as("price"))

  /** F3: V2 per-market flatten. `game_id` prefers the API id, falling
    * back to the synthetic concat (`odds_utils.py:194`); outcome
    * coalesces `name`/`description`/`team` (`:202`); per-value numeric
    * coercion (`:203`).
    */
  def flattenMarket(games: DataFrame, marketKey: String): DataFrame =
    explodeChain(games, marketKey).select(
      coalesce(col("id"),
        syntheticGameId(col("home_team"), col("away_team"),
          col("commence_time"))).as("game_id"),
      col("sport_key"),
      col("commence_time"),
      col("home_team"),
      col("away_team"),
      col("bk.title").as("bookmaker"),
      col("bk.last_update").as("last_update"),
      col("mkt.key").as("market"),
      coalesce(col("o.name"), col("o.description"), col("o.team"))
        .as("outcome"),
      numericCoerce(col("o.price")).as("price_decimal"))

  /** F4: V2 standardization over one or more markets: flatten each,
    * union, drop invalid prices (null or <= 1 decimal — P3,
    * `odds_utils.py:223-226`), add `odds_american` (X2) and
    * `implied_prob = 1/decimal` (X5, `odds_utils.py:231-232`).
    *
    * The reference logs per-row warnings for skipped rows; at scale a
    * log line per bad row is an anti-pattern — the companion
    * [[standardizeRejects]] returns the rejected rows as a DataFrame
    * side-channel instead.
    */
  def standardizeOdds(games: DataFrame, marketKeys: Seq[String]): DataFrame = {
    require(marketKeys.nonEmpty,
      "standardizeOdds: marketKeys must be non-empty")
    val flattened = marketKeys.map(flattenMarket(games, _))
      .reduce(_ unionByName _)
    flattened
      .filter(col("price_decimal").isNotNull && col("price_decimal") > 1)
      .withColumn("odds_american", decimalToAmerican(col("price_decimal")))
      .withColumn("implied_prob", impliedProb(col("price_decimal")))
  }

  /** Rows `standardizeOdds` drops (the reference's warned-and-skipped
    * rows, `odds_utils.py:223-230`), for observability.
    */
  def standardizeRejects(games: DataFrame,
                         marketKeys: Seq[String]): DataFrame = {
    require(marketKeys.nonEmpty,
      "standardizeRejects: marketKeys must be non-empty")
    marketKeys.map(flattenMarket(games, _)).reduce(_ unionByName _)
      .filter(col("price_decimal").isNull || col("price_decimal") <= 1)
  }

  /** F5 `parse_market` (`src/analysis.py:9-23`): per (game, outcome)
    * keep the best price and its bookmaker. pandas keeps the FIRST max
    * encountered in traversal order; we pin the tiebreak to the lowest
    * bookmaker name (deterministic under any row order — SURVEY §7.4).
    * This is THE grouped-argmax window — `Arb.bestPrices` delegates
    * here so the tiebreak has one home.
    */
  def parseMarket(flattened: DataFrame, priceCol: String = "price",
                  tieBreak: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (price desc, bookmaker asc) is total only when a bookmaker
    // quotes one price per outcome; pass tieBreak columns (e.g.
    // last_update) when the same book can appear twice per
    // (game, outcome) — otherwise the surviving payload row is
    // partitioning-dependent
    val ordering = col(priceCol).desc +: col("bookmaker").asc +:
      tieBreak.map(col(_).asc)
    val w = Window.partitionBy(col("game_id"), col("outcome"))
      .orderBy(ordering: _*)
    flattened
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
