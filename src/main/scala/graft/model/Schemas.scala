package graft.model

import org.apache.spark.sql.types._

/** Pinned StructTypes for the engine's tables.
  *
  * The nested odds-API shape mirrors the reference fixture
  * `data/sample_odds.json:1-61` (traversed at `src/ingestion.py:78-104`,
  * `src/processing.py:37-64`, `Sports-Pipeline-V2/odds_utils.py:182-206`).
  * Alternate outcome/price key spellings (`odds`/`price_decimal`,
  * `outcome`/`outcome_name`/`team`) are part of the schema because the
  * reference coalesces across them (`src/processing.py:52,62`).
  */
object Schemas {

  val outcomeType: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("description", StringType),   // player name for props
    StructField("point", DoubleType),         // line/handicap
    StructField("price", DoubleType),
    // alternate key spellings the reference coalesces over:
    StructField("odds", DoubleType),
    StructField("price_decimal", DoubleType),
    StructField("outcome", StringType),
    StructField("outcome_name", StringType),
    StructField("team", StringType)
  ))

  val marketType: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("outcomes", ArrayType(outcomeType))
  ))

  val bookmakerType: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("title", StringType),
    StructField("last_update", StringType),
    StructField("markets", ArrayType(marketType))
  ))

  /** Nested odds-API game record (list of these per JSON file). */
  val oddsSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("sport_key", StringType),
    StructField("sport_title", StringType),
    StructField("commence_time", StringType),  // ISO-8601 kept as string
    StructField("home_team", StringType),
    StructField("away_team", StringType),
    StructField("bookmakers", ArrayType(bookmakerType))
  ))

  /** Canonical 11-column props table, column order pinned
    * (`src/ingestion.py:105-118`, `docs/README.md:6-19`).
    */
  val canonicalPropsColumns: Seq[String] = Seq(
    "timestamp", "game_id", "commence_time", "home_team", "away_team",
    "bookmaker", "last_update", "player_name", "market", "line", "price")

  /** Flattened odds table (`src/processing.py:29-31`). */
  val flattenedColumns: Seq[String] = Seq(
    "game_id", "sport", "commence_time", "home_team", "away_team",
    "bookmaker", "last_update", "market", "outcome", "price")

  /** Player game-log input for feature building (`src/features.py:6-7`). */
  val gameLogSchema: StructType = StructType(Seq(
    StructField("player", StringType),
    StructField("date", DateType),
    StructField("points", DoubleType),
    StructField("rebounds", DoubleType),
    StructField("assists", DoubleType)
  ))

  /** Multimodal asset table: opaque binary payload + typed metadata
    * (capability extension — no reference counterpart).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType),    // image | audio | video
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)
  ))
}
