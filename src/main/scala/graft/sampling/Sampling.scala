package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes (capability
  * extension — the "rebalance the corpus" step of an LLM data
  * pipeline).
  *
  * `sample(fraction)` on a DataFrame is partition-dependent and
  * unreproducible across engines/runs; these samplers hash a KEY
  * instead, so membership is a pure function of (key, salt) — stable
  * under repartitioning, re-runs, and engine swaps (the md5 arithmetic
  * is reproducible in any SQL engine), and sliceable incrementally
  * (yesterday's keep/drop decisions never flip when new data arrives).
  *
  * Scale shape: a per-row hash + filter — no shuffle, no state, fully
  * pushdown-friendly for everything upstream of it.
  */
object Sampling {

  /** Uniform [0, 1) hash fraction of a key: the first 8 hex chars of
    * md5(salt + key) as a 32-bit integer over 2^32. Change `salt` to
    * draw an independent sample.
    */
  def hashFraction(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 8),
      16, 10).cast("long").cast("double") / 4294967296.0

  /** Named split assignment (train/val/test …) from the hash
    * fraction: the first (name, upperBound) whose bound exceeds the
    * row's fraction wins. Bounds are cumulative and ascending, e.g.
    * `Seq("train" -> 0.9, "val" -> 0.95, "test" -> 1.0)`. Per-key and
    * salt-scoped like [[hashFraction]]: a row's split never changes
    * as data is added, repartitioned, or re-processed by another
    * engine.
    */
  def assignSplit(key: Column, bounds: Seq[(String, Double)],
                  salt: String = ""): Column = {
    require(bounds.nonEmpty, "assignSplit: bounds must be non-empty")
    require(bounds.map(_._2) == bounds.map(_._2).sorted,
      s"assignSplit: bounds must ascend, got $bounds")
    val frac = hashFraction(key, salt)
    bounds.init.reverse.foldLeft(lit(bounds.last._1)) {
      case (acc, (name, upper)) =>
        when(frac < upper, lit(name)).otherwise(acc)
    }
  }

  /** Keep a row iff its hash fraction falls under its stratum's rate
    * (strata absent from `rates` keep `defaultRate`). Downsampling a
    * dominant language/source to a target mix is the canonical use.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       rates: Map[String, Double],
                       key: Column, salt: String = "",
                       defaultRate: Double = 1.0): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
        when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
      }
    df.filter(hashFraction(key, salt) < rate)
  }
}
