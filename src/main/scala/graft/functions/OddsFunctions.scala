package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar odds-math column library.
  *
  * Pure `Column => Column` functions (Catalyst-optimizable, codegen'd —
  * no UDFs), re-expressing the reference's vectorized numpy/pandas odds
  * helpers:
  *   - american↔decimal conversion: reference `src/processing.py:9-19`,
  *     `Sports-Pipeline-V2/odds_utils.py:45-73`
  *   - numeric coercion of string prices: `src/processing.py:22-24`
  *   - mixed-format heuristic: `src/processing.py:98-112`
  *   - implied probability: `src/processing.py:115`, `odds_utils.py:231`
  *   - EV / variance / adjusted EV / half-Kelly:
  *     `Sports-Pipeline-V2/ev_calculator.py:10-45`
  */
object OddsFunctions {

  /** American → decimal odds. `odds > 0 → odds/100 + 1`; `odds <= 0 →
    * 100/(-odds) + 1`. DOCUMENTED DIVERGENCE: the reference's numpy
    * sends `0` through the negative branch to -Infinity
    * (`src/processing.py:17-18`); Spark's Divide yields null on a zero
    * divisor, so `0` maps to null here — the saner sentinel for an
    * impossible price (pinned in OddsFunctionsSpec). Null-safe.
    */
  def americanToDecimal(odds: Column): Column =
    when(odds > 0, odds / 100.0 + 1.0)
      .when(odds <= 0, lit(100.0) / -odds + 1.0)
      .otherwise(lit(null).cast("double"))

  /** Decimal → American odds, rounded to 2. Branch order pinned to the
    * reference (`odds_utils.py:61-73`): `d <= 1 → null`; `d >= 2 →
    * round((d-1)*100, 2)`; else `round(-100/(d-1), 2)`.
    * `roundFn` lets callers swap the rounding mode (the oracle queries
    * pass [[PortableRound.pround]] for DuckDB-identical boundaries).
    */
  def decimalToAmerican(dec: Column,
                        roundFn: (Column, Int) => Column =
                          (c, d) => round(c, d)): Column =
    when(dec.isNull || dec <= 1, lit(null).cast("double"))
      .when(dec >= 2, roundFn((dec - 1) * 100.0, 2))
      .otherwise(roundFn(lit(-100.0) / (dec - 1), 2))

  /** Coerce a possibly-string price ("+120", "2.05") to double; null on
    * failure (pandas `to_numeric(errors="coerce")`,
    * `src/processing.py:22-24`). Leading '+' stripped explicitly.
    */
  def numericCoerce(price: Column): Column =
    regexp_replace(trim(price.cast("string")), "^\\+", "").cast("double")

  /** Per-row odds-format heuristic (`src/processing.py:98-112`):
    * `price <= 0 OR abs(price) >= 100` ⇒ American (convert); else the
    * value already is decimal. Null prices stay null (pandas NaN
    * comparisons are False ⇒ NaN flows through unconverted; Spark's
    * `when` sends null to `otherwise`, which is the identity here).
    */
  def decimalize(price: Column): Column =
    when(price <= 0 || abs(price) >= 100, americanToDecimal(price))
      .otherwise(price)

  /** Implied probability `1/decimal` (`src/analysis.py:34-36`). */
  def impliedProb(dec: Column): Column =
    when(dec.isNull, lit(null).cast("double")).otherwise(lit(1.0) / dec)

  // ----- EV / bankroll math (Sports-Pipeline-V2/ev_calculator.py) -----

  /** EV per $1 stake: `p*(dec-1) - (1-p)` (`ev_calculator.py:16-21`). */
  def expectedValue(trueProb: Column, dec: Column): Column =
    trueProb * (dec - 1.0) - (lit(1.0) - trueProb)

  /** Outcome variance: `p*(payout-EV)^2 + (1-p)*(-1-EV)^2`
    * (`ev_calculator.py:24-29`). Named to avoid clashing with
    * `sql.functions.variance` (the sample-variance aggregate).
    */
  def outcomeVariance(trueProb: Column, dec: Column, ev: Column): Column =
    trueProb * pow(dec - 1.0 - ev, 2) +
      (lit(1.0) - trueProb) * pow(lit(-1.0) - ev, 2)

  /** Risk-adjusted EV `EV - lambda*Var`, lambda=0.5 default
    * (`ev_calculator.py:32-34`).
    */
  def adjustedEv(ev: Column, varCol: Column, lambdaRisk: Double = 0.5): Column =
    ev - lit(lambdaRisk) * varCol

  /** Half-Kelly stake fraction, capped (`ev_calculator.py:37-45`):
    * `b = dec-1`; full Kelly `(b*p - (1-p))/b` when `b > 0` else 0;
    * `half = max(full, 0) * 0.5`; result `min(half, cap)`, cap=0.05.
    */
  def halfKelly(trueProb: Column, dec: Column, cap: Double = 0.05): Column = {
    val b = dec - 1.0
    val full = when(b > 0, (b * trueProb - (lit(1.0) - trueProb)) / b)
      .otherwise(lit(0.0))
    least(greatest(full, lit(0.0)) * 0.5, lit(cap))
  }

  /** Bet flag `ev >= threshold` (`ev_calculator.py:65`). */
  def betFlag(ev: Column, threshold: Double = 0.02): Column = ev >= threshold

  /** Decision label (`widgets_ui.py:42`). */
  def decisionLabel(flag: Column): Column =
    when(flag, lit("✅ Bet")).otherwise(lit("❌ Pass"))

  /** Synthetic game id `{home}_vs_{away}_{commence}`
    * (`src/processing.py:38`, `odds_utils.py:194`).
    */
  def syntheticGameId(home: Column, away: Column, commence: Column): Column =
    concat(home, lit("_vs_"), away, lit("_"), commence)
}
