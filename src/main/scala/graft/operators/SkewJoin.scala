package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (scale utility; no reference
  * counterpart — the reference is single-process pandas).
  *
  * At 100 TB a single hot key (one game with millions of odds rows,
  * one document fingerprint shared by a boilerplate page) turns a
  * shuffle join into one straggler task. AQE's skew-join handles sort
  * -merge cases; this utility covers the general pattern explicitly:
  * the skewed (large) side gets a deterministic salt derived from its
  * other columns, the small side is replicated `buckets` times, and
  * the join key becomes (key, salt) — spreading each hot key over
  * `buckets` tasks.
  */
object SkewJoin {

  /** Inner equi-join `large ⋈ small` on `key`, with `large`'s hot keys
    * spread across `buckets` partitions. `saltSource` must be a
    * column of `large` (any type) whose hash spreads rows — e.g. a
    * row id or secondary key; determinism follows from it.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, buckets: Int = 8): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(hash(saltSource), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
