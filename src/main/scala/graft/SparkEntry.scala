package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Arb, Devig}
import graft.functions.OddsFunctions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` exposes one named query per implemented operator family
  * (SURVEY §2 + the LLM-data scale operators), each paired with
  * equivalent DuckDB SQL in `oracleSql` for the driver's hash-compare
  * at sf0.01.
  */
object SparkEntry {

  /** Flagship query (SURVEY §7.2): the reference's "best price +
    * arbitrage margin per game" pipeline — flatten-shaped odds derived
    * from lineitem, decimalize (X1/X4), implied prob (X5), proportional
    * devig (A1), best-price argmax (A2), arb margin with two-outcome
    * guard (A4/P8) — on sf0.001. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val odds = li.select(
      col("l_orderkey").cast("string").as("game_id"),
      when(col("l_linenumber") % 2 === 0, lit("home")).otherwise(lit("away"))
        .as("outcome"),
      concat(lit("book_"), (col("l_suppkey") % 7).cast("string"))
        .as("bookmaker"),
      when(col("l_partkey") % 3 === 0,
        when(col("l_partkey") % 2 === 0, lit(1.0)).otherwise(lit(-1.0)) *
          (lit(100.0) + (col("l_partkey") % 150).cast("double")))
        .otherwise(((col("l_partkey") % 300).cast("double") + 101.0) / 100.0)
        .as("price"))
      .withColumn("home_team", concat(lit("home_"), col("game_id")))
      .withColumn("away_team", concat(lit("away_"), col("game_id")))
    val enriched = Devig.proportional(
      odds.withColumn("price", decimalize(col("price")))
        .withColumn("implied_prob", impliedProb(col("price"))),
      "implied_prob", Seq("game_id"), "devig_prob")
    Arb.summary(enriched)
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ scale ops). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.queries ++ QueriesScale.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    QueriesCore.oracles ++ QueriesScale.oracles
}
